"""Property-based equivalence: the Arrow-vectorized engine pass must
match the pure-Python oracle on RANDOM span sequences — not just the
generator's grammar-shaped ones. Hypothesis drives the input space
(arbitrary kinds, malformed fields, broken offsets, null text/refs)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from fastpasta_spark import schema as S
from fastpasta_spark.functions.fsm import stateless_doc_checks, validate_spans

KINDS = [*S.VALID_KINDS, "junk", "x", None]  # VALID_KINDS includes 'pad'
TEXTS = ["", "lanes=3", "cont=0,bc=5", "cont=1,bc=2", "done=0", "done=1",
         "garbage", "bc=9", "hello world", None, "lanes=x", "cont=2,bc=1",
         # page/orbit running counters (E31/E32/E441)
         "lanes=2,page=0", "lanes=2,page=1", "lanes=3,page=2", "lanes=1,page=x",
         "cont=0,bc=5,orbit=7", "cont=0,bc=6,orbit=6", "cont=0,bc=7,orbit=5",
         # lane/chip layer (E704/E705/E9003-9006)
         "lanes=2,lane_ids=0;1,chips=2", "lane=0,chips=0;1,cbc=5",
         "lane=1,chips=8;9,cbc=5", "lane=9,chips=x;y,cbc=6", "lane=1,chips=3,cbc=7",
         # adversarial kv shapes: empty keys/values, bare separators,
         # negative + beyond-int64 numerics, duplicate keys, whitespace
         "lanes=", "=", ",,,", "= , =", "bc=-1", "cont=0,bc=-5",
         "bc=99999999999999999999", "page=-1", "lanes=2,lanes=3",
         " lanes = 2 ", "lane_ids=;;", "chips=", "cbc=", "done=,cont=1",
         # internal-trigger fields around the E45 period boundary (198)
         "cont=0,bc=100,int=1", "cont=0,bc=298,int=1", "cont=0,bc=496,int=1",
         "cont=0,bc=300,int=1", "cont=0,bc=3560,int=1", "cont=0,bc=130,int=0",
         "int=1", "int=x,bc=5", "cont=1,bc=298,int=1",
         # diag checked fields (E61), readout-flag census, APE table
         # (E9007 WARNING/FATAL/unknown) — all opt-in kv, so they also
         # land on non-diag/non-lane spans harmlessly
         "idx=1,resv=0", "idx=0,resv=0", "resv=5", "idx=zz", "resv=",
         "lane=0,chips=0;1,cbc=5,rf=184", "lane=1,chips=8;9,cbc=5,rf=177",
         "lane=0,chips=0;1,cbc=5,ape=242", "lane=1,chips=8;9,cbc=5,ape=244",
         "lane=0,ape=0", "lane=1,ape=243", "lane=0,ape=x", "ape=244",
         "lane=0,chips=0;1,cbc=5,ape=253", "lane=1,rf=190,ape=251"]
REFS = ["", "m1", "missing_9", None]

span_st = st.tuples(
    st.sampled_from(KINDS),
    st.sampled_from(TEXTS),
    st.sampled_from(REFS),
    st.one_of(st.integers(-2, 30), st.none()),
)
doc_st = st.lists(span_st, min_size=0, max_size=14)


@settings(max_examples=300, deadline=None)
@given(doc_st)
def test_fsm_oracle_total_and_deterministic(spans):
    """The oracle itself never crashes and is deterministic on arbitrary
    input (totality of the grammar over the full input space)."""
    a = validate_spans(spans)
    b = validate_spans(spans)
    assert a == b
    for _idx, _off, code, sev, _msg in a:
        assert code in S.ALL_CODES
        assert sev in (S.SEV_ERROR, S.SEV_WARNING, S.SEV_FATAL)
    c = stateless_doc_checks("doc1", spans or None)
    assert c == stateless_doc_checks("doc1", spans or None)


@settings(max_examples=300, deadline=None)
@given(doc_st)
def test_fsm_oracle_total_under_chip_config(spans):
    """The config-override path (round-4 CustomChecksConfig) is as total
    and deterministic as the default path, the orderings config fully
    REPLACES the strictly-increasing rule, and a no-op config equals
    the default behavior."""
    cfg = dict(chips_per_lane=2, legal_chip_orderings=[[0, 1], [9, 8]])
    a = validate_spans(spans, **cfg)
    assert a == validate_spans(spans, **cfg)
    for _idx, _off, code, sev, msg in a:
        assert code in S.ALL_CODES
        assert sev in (S.SEV_ERROR, S.SEV_WARNING, S.SEV_FATAL)
        if code == S.E9005_CHIP_ORDER:
            # the default rule's message cannot appear under a config
            assert "strictly increasing" not in msg
    # None-config is byte-identical to the legacy two-arg call
    assert validate_spans(spans, chips_per_lane=None,
                          legal_chip_orderings=None) == validate_spans(spans)


def test_engine_matches_oracle_on_random_docs(spark):
    """Run the Arrow pass over a Hypothesis-style randomized corpus and
    compare row-for-row with the oracle. (One Spark job over many random
    docs, instead of a job per Hypothesis example.)"""
    import random

    from fastpasta_spark.operators.sequence import (
        sequence_pass,
        split_sequence_output,
    )

    rng = random.Random(1234)
    rows = []
    for i in range(400):
        n = rng.randint(0, 14)
        spans = [
            {
                "kind": rng.choice(KINDS),
                "text": rng.choice(TEXTS),
                "media_ref": rng.choice(REFS),
                "offset": rng.choice([None, -1, rng.randint(0, 20), idx]),
            }
            for idx in range(n)
        ]
        rows.append((f"r{i:04d}", spans if n else rng.choice([[], None])))

    docs = spark.createDataFrame(rows, schema=S.DOCS_SCHEMA)
    viol, _ = split_sequence_output(sequence_pass(docs, fused=True))
    got = sorted(
        ((r.doc_id, r.span_idx, r.offset, r.check_code, r.severity, r.message)
         for r in viol.collect()),
        key=lambda v: (v[0], -2 if v[1] is None else v[1], v[2], v[3], v[5]),
    )

    expected = []
    for doc_id, spans in rows:
        tuples = (
            None if spans is None
            else [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        )
        for si, off, code, sev, msg in stateless_doc_checks(doc_id, tuples or None):
            expected.append((doc_id, si, off, code, sev, msg))
        for si, off, code, sev, msg in validate_spans(tuples or []):
            expected.append((doc_id, si, off, code, sev, msg))
    expected.sort(key=lambda v: (v[0], -2 if v[1] is None else v[1], v[2], v[3], v[5]))

    assert got == expected
