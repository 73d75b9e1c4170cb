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


def _mutated(spark: SparkSession, mutation: int, n_docs: int = 500,
             cfg: CorpusConfig | None = None) -> DataFrame:
    """Corpus where EVERY corrupted doc uses one specific mutation class.

    corrupt_per_mille=1000 makes every doc corrupt; we then monkey-select
    the class by regenerating with a config whose hash routing is
    bypassed: simplest deterministic approach — generate clean docs and
    apply the mutation to every doc via the same pure functions.
    """
    import pandas as pd

    from fastpasta_spark import schema as S

    # the caller's n_docs always wins — a provided cfg carries mutation
    # knobs, not the corpus size
    from dataclasses import replace

    cfg = (replace(cfg, n_docs=n_docs) if cfg is not None
           else CorpusConfig(n_docs=n_docs))

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


# lane-layer / trigger-period corpora: every frame carries the full
# lane+chip structure (≥2 content spans and ≥2 frames so order/bc/period
# mutations always have something to corrupt)
_LANE_CFG = CorpusConfig(n_docs=400, lane_layer=True, chips_per_lane=2,
                         min_frames=2, min_content=2)
_PERIOD_CFG = CorpusConfig(n_docs=400, trigger_period=198, min_frames=2)


def bad_trigger_period(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Internal-trig bc off-period -> E45 (tdh.rs:60-109 analogue).
    Validate with check_all(..., trigger_period=198)."""
    return _mutated(spark, synth.MUT_BAD_PERIOD, n_docs, cfg=_PERIOD_CFG)


def bad_lane_ids(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Content lane not in the declared lane set -> E704
    (util.rs:184-189 membership analogue)."""
    return _mutated(spark, synth.MUT_LANE_UNDECLARED, n_docs, cfg=_LANE_CFG)


def bad_lane_order(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Lanes out of order within a frame -> E705
    (alpide_readout_frame.rs:94-130 grouping analogue)."""
    return _mutated(spark, synth.MUT_LANE_ORDER, n_docs, cfg=_LANE_CFG)


def bad_chip_count(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Chip count != declared chips per lane -> E9004."""
    return _mutated(spark, synth.MUT_CHIP_COUNT, n_docs, cfg=_LANE_CFG)


def bad_chip_order(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Chip ids not strictly increasing -> E9005
    (lane_alpide_frame_analyzer.rs:288-320 analogue)."""
    return _mutated(spark, synth.MUT_CHIP_ORDER, n_docs, cfg=_LANE_CFG)


def bad_chip_bc(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Chip bc mismatch across a frame's lanes -> E9003
    (lane_alpide_frame_analyzer.rs:213-259 analogue)."""
    return _mutated(spark, synth.MUT_CHIP_BC, n_docs, cfg=_LANE_CFG)


def fatal_lanes(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Undecodable chip stream -> one E9006 FATAL per doc; the lane's
    spans vanish from later frames and the A8 propagation keeps E702
    quiet (readout_frame.rs:40-50 fatal_lanes analogue)."""
    return _mutated(spark, synth.MUT_FATAL_LANE, n_docs, cfg=_LANE_CFG)


# page/orbit running-counter corpora (R1-R3 true docs-model form):
# headers carry page=, trigs orbit=; ≥2 frames so counter mutations
# always have a second frame to corrupt
_PAGE_CFG = CorpusConfig(n_docs=400, page_orbit=True, min_frames=2)


def bad_page_counter(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Header page counter skips -> E31 (rdh pages-counter analogue)."""
    return _mutated(spark, synth.MUT_PAGE_SKIP, n_docs, cfg=_PAGE_CFG)


def bad_page_fields(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Header lanes= changes at page>0 (content adjusted so only the
    same-fields check fires) -> E32."""
    return _mutated(spark, synth.MUT_PAGE_FIELDS, n_docs, cfg=_PAGE_CFG)


def bad_orbit(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Orbit advances without a stop (trailer done=0) -> E441
    (orbit-change-after-stop analogue)."""
    return _mutated(spark, synth.MUT_ORBIT_NO_STOP, n_docs, cfg=_PAGE_CFG)


# padding-gate corpora (C7): docs end with a trailing pad run
_PAD_SPANS_CFG = CorpusConfig(n_docs=400, pad_spans=True)


def bad_pad_position(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Pad span inside an open frame -> E82 (padding gate)."""
    return _mutated(spark, synth.MUT_PAD_INSIDE, n_docs, cfg=_PAD_SPANS_CFG)


def bad_pad_content(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Trailing pad carrying text -> E74 (corrupt flush padding)."""
    return _mutated(spark, synth.MUT_PAD_DIRTY, n_docs, cfg=_PAD_SPANS_CFG)


def ape_warnings(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """WARNING-class APE on a lane span -> E9007 WARNING, verdict still
    PASS (alpide_word.rs:35-49 severity table)."""
    return _mutated(spark, synth.MUT_APE_WARNING, n_docs, cfg=_LANE_CFG)


def ape_fatal(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """FATAL-class APE -> E9007 FATAL + the lane joins the running
    fatal set (lane_alpide_frame_analyzer.rs:166-170)."""
    return _mutated(spark, synth.MUT_APE_FATAL, n_docs, cfg=_LANE_CFG)


def bad_diag_fields(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Diag footer with resv != 0 -> E61 (DDW0 field sanity analogue,
    ddw.rs:9-46: reserved == 0, index >= 1)."""
    return _mutated(spark, synth.MUT_DIAG_RESV, n_docs)


def bad_diag_index(spark: SparkSession, n_docs: int = 400) -> DataFrame:
    """Diag footer with idx < 1 -> E61 (checks_list.md:97 index >= 1)."""
    return _mutated(spark, synth.MUT_DIAG_IDX, n_docs)


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
    "bad_trigger_period": bad_trigger_period,
    "bad_lane_ids": bad_lane_ids,
    "bad_lane_order": bad_lane_order,
    "bad_chip_count": bad_chip_count,
    "bad_chip_order": bad_chip_order,
    "bad_chip_bc": bad_chip_bc,
    "fatal_lanes": fatal_lanes,
    "bad_page_counter": bad_page_counter,
    "bad_page_fields": bad_page_fields,
    "bad_orbit": bad_orbit,
    "bad_pad_position": bad_pad_position,
    "bad_pad_content": bad_pad_content,
    "bad_diag_fields": bad_diag_fields,
    "bad_diag_index": bad_diag_index,
    "ape_warnings": ape_warnings,
    "ape_fatal": ape_fatal,
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
        "bad_lane_ids": {"E704"},
        "bad_lane_order": {"E705"},
        "bad_chip_count": {"E9004"},
        "bad_chip_order": {"E9005"},
        "bad_chip_bc": {"E9003"},
        "fatal_lanes": {"E9006"},
        "bad_page_counter": {"E31"},
        "bad_page_fields": {"E32"},
        "bad_orbit": {"E441"},
        "bad_pad_position": {"E82"},
        "bad_pad_content": {"E74"},
        "bad_diag_fields": {"E61"},
        "bad_diag_index": {"E61"},
        "ape_warnings": {"E9007"},
        "ape_fatal": {"E9007"},
    }
