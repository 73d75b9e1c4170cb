"""Named fixture families — one per check class, per FIXTURES.md.

The reference tests against 18 curated raw files, each exercising one
good/bad scenario (`/root/reference/fastpasta/tests/util/mod.rs:19-36`).
These constructors are the engine's equivalents: each returns a
deterministic docs DataFrame whose violations are dominated by ONE
check family (plus a clean baseline). Used by tests and available to
users as ready-made regression corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpasta_spark.sources import synth
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df


def _mutated(spark: SparkSession, mutation: int, n_docs: int = 500) -> DataFrame:
    """Corpus where EVERY corrupted doc uses one specific mutation class.

    corrupt_per_mille=1000 makes every doc corrupt; we then monkey-select
    the class by regenerating with a config whose hash routing is
    bypassed: simplest deterministic approach — generate clean docs and
    apply the mutation to every doc via the same pure functions.
    """
    import pandas as pd

    from fastpasta_spark import schema as S

    cfg = CorpusConfig(n_docs=n_docs)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                doc_id = f"doc{i:010d}"
                spans = synth._doc_spans(i, cfg)
                h = synth.splitmix64(cfg.seed * 0xA5A5 + i * 3 + 1)
                spans = synth._mutate([dict(s) for s in spans], mutation, h, cfg)
                rows.append((doc_id, spans))
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    rng = spark.range(0, n_docs, 1, numPartitions=max(1, n_docs // 512 + 1))
    return rng.mapInPandas(gen, schema=S.DOCS_SCHEMA)


def clean_small(spark: SparkSession, n_docs: int = 1000) -> DataFrame:
    """All valid — golden-metrics-only fixture (10_rdh.raw analogue)."""
    return corpus_df(spark, CorpusConfig(n_docs=n_docs))


def bad_kind(spark: SparkSession, n_docs: int = 500) -> DataFrame:
    """Invalid span kinds -> E70 (1_hbf_bad_dw_ddw0.raw analogue)."""
    return _mutated(spark, synth.MUT_BAD_KIND, n_docs)


def bad_sequence(spark: SparkSession, n_docs: int = 500) -> DataFrame:
    """Trailer-before-header reordering -> E992/E990/E11 grammar errors
    (1_hbf_bad_cdp_structure.raw analogue)."""
    return _mutated(spark, synth.MUT_SWAP_FIRST, n_docs)


def bad_offsets(spark: SparkSession, n_docs: int = 500) -> DataFrame:
    """Offset gaps -> E11 (pages_counter running-check analogue)."""
    return _mutated(spark, synth.MUT_OFFSET_GAP, n_docs)


def bad_fields(spark: SparkSession, n_docs: int = 500) -> DataFrame:
    """Malformed trig fields -> E40 (RDH/TDH sanity analogue)."""
    return _mutated(spark, synth.MUT_BAD_FIELDS, n_docs)


def dup_keys(spark: SparkSession, n_docs: int = 500,
             hot_copies: int = 1000) -> DataFrame:
    """Duplicate + hot doc_ids -> E100 (uniqueness/skew fixture)."""
    return corpus_df(spark, CorpusConfig(n_docs=n_docs, dup_per_mille=100,
                                         hot_key_copies=hot_copies))


def dangling_refs(spark: SparkSession, n_docs: int = 500) -> DataFrame:
    """media_refs absent from the media table -> E110."""
    return _mutated(spark, synth.MUT_DANGLING_REF, n_docs)


def empty_frames(spark: SparkSession, n_docs: int = 500) -> DataFrame:
    """Frames with trailer but no content -> E701
    (2_hbf_2nd_bad_frame.raw analogue)."""
    return _mutated(spark, synth.MUT_EMPTY_FRAME, n_docs)


def drifted(spark: SparkSession, n_docs: int = 500) -> DataFrame:
    """Shifted kind distribution (heavy corruption) for drift checks."""
    return corpus_df(spark, CorpusConfig(n_docs=n_docs, corrupt_per_mille=900))


def resume_corpus(spark: SparkSession, n_docs: int = 2000) -> DataFrame:
    """64-bucket-friendly corpus for kill/resume tests."""
    return corpus_df(spark, CorpusConfig(n_docs=n_docs, corrupt_per_mille=100))


FIXTURES = {
    "clean_small": clean_small,
    "bad_kind": bad_kind,
    "bad_sequence": bad_sequence,
    "bad_offsets": bad_offsets,
    "bad_fields": bad_fields,
    "dup_keys": dup_keys,
    "dangling_refs": dangling_refs,
    "empty_frames": empty_frames,
    "drifted": drifted,
    "resume_corpus": resume_corpus,
}


def expected_dominant_codes() -> dict[str, set[str]]:
    """Per fixture family: codes that MUST appear (goldenable contract)."""
    return {
        "clean_small": set(),
        "bad_kind": {"E70"},
        "bad_sequence": {"E992"},
        "bad_offsets": {"E11"},
        "bad_fields": {"E40"},
        "dup_keys": {"E100"},
        "dangling_refs": {"E110"},
        "empty_frames": {"E701"},
    }
