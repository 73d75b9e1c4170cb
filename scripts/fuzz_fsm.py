"""Long-run engine/oracle FSM parity fuzz (beyond the CI-sized
Hypothesis tests): N random docs per seed over the FULL hostile input
space — arbitrary kinds, malformed kv fields, broken offsets, null
text/refs, and regex-hostile doc_ids (trailing newline, spaces, empty,
NULL). Compares the Arrow pass output against the pure-Python oracle as
a MULTISET (row order is not part of the contract; rows can coincide
across NULL/empty doc_id docs).

    python scripts/fuzz_fsm.py [n_docs_per_seed] [seed [seed ...]]

Round-2 evidence: all three legs x 30,000 docs x seeds (7, 99, 2026)
-> ~3.3M violation rows, exact multiset parity on every leg; plus the
earlier single-leg runs at 100,000 docs x seeds (41, 2027). The legs
found and now guard three real divergences: NULL-offset normalization
and NULL-kind E73 (SQL three-valued `<>`) in the Column battery, and
the Unicode lower() tokenizer split (fixed in functions/hashing.py).

Round-3 evidence: vocabulary extended with diag checked fields (E61),
readout-flag bytes (rf=) and the APE table (E9007 incl. unknown/
unparseable bytes); all three legs x 30,000 docs x seeds (7, 99, 2026)
-> ~3.4M rows, exact multiset parity on every leg (also re-run after
the kv-parse memoization landed). A fourth leg compares the ALPIDE
readout-flag/APE census (stats partials, invisible to the violation
legs) against an independent Python replay — ~22k counts across the
three seeds, exact parity.

Round-4: a fifth leg runs the chip-layer CONFIG overrides
(chips_per_lane + legal_chip_orderings, the custom-TOML surface) over
the same hostile rows — the orderings list deliberately legalizes a
non-increasing sequence and outlaws an increasing one, so the
replacement semantics are fuzzed, not just defaults. Evidence: all
five legs x 30,000 docs x seeds (7, 99, 2026, 31337) -> ~9M violation
rows + ~29k census counts, exact multiset parity on every leg (run on
the post-vectorization fused pass with lazy doc-id materialization).
Round-5: re-run with fresh seeds (505, 8191) x 30,000 docs over the
clean-doc pre-screen + columnar media_ref_rows code — all 10 legs
(~4.5M rows + ~15k census counts) exact multiset parity. A sixth leg
fuzzes the in-pass E110 referential check (seed-derived valid-id set,
engine vs stateless_doc_checks(valid_media_ids=)); evidence: all six
legs x 30,000 docs x fresh seeds (1213, 4242) -> ~2.7M rows + ~14.6k
census counts, exact multiset parity (~4.8k E110 rows per seed).
Round-6: a seventh leg draws the CONFIG ITSELF from the seed —
chips_per_lane incl. None/0, random orderings with duplicates and
non-increasing runs, random trigger period, random valid-id set, all
four knobs compounded in one engine run. Evidence: all seven legs x
30,000 docs x fresh seeds (606, 1717) -> ~6.3M rows + ~15k census
counts, exact multiset parity on every leg (the drawn configs hit
cpl=3 ords=[[7,5,7,2],[6,9,2],[7,1]] tp=7 |valid|=1 and cpl=4
ords=[[8,9],[8,2],[7,6,9]] tp=7 |valid|=0). Post-re-pin re-run on the
final round-6 code: seeds (90210, 31415, 27183) x all seven legs ->
~9.4M rows + ~22k census counts, exact parity everywhere, drawn
configs covering cpl=None/0/1 and ords with singleton + duplicate-id
orderings.
"""

from __future__ import annotations

import random
import sys
from collections import Counter

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main(n_docs: int = 30_000, seeds: tuple[int, ...] = (7, 99, 2026)) -> int:
    from test_property import KINDS, REFS, TEXTS

    from fastpasta_spark import schema as S
    from fastpasta_spark.functions.fsm import (
        stateless_doc_checks, validate_spans)
    from fastpasta_spark.operators.sequence import (
        sequence_pass, split_sequence_output)
    from fastpasta_spark.session import get_spark

    spark = get_spark(app_name="fuzz_fsm", cores=16)
    rc = 0
    for seed in seeds:
        rng = random.Random(seed)
        rows = []
        for i in range(n_docs):
            n = rng.randint(0, 14)
            spans = [
                {"kind": rng.choice(KINDS), "text": rng.choice(TEXTS),
                 "media_ref": rng.choice(REFS),
                 "offset": rng.choice([None, -1, rng.randint(0, 20), idx])}
                for idx in range(n)
            ]
            doc_id = rng.choice([f"r{i:05d}", f"r{i:05d}\n", f"bad id {i}",
                                 "", None, f"ok_{i}-x"])
            rows.append((doc_id, spans if n else rng.choice([[], None])))

        docs = spark.createDataFrame(rows, schema=S.DOCS_SCHEMA).repartition(16)

        def oracle(include_fsm: bool) -> Counter:
            exp: Counter = Counter()
            for doc_id, spans in rows:
                tuples = (None if spans is None else
                          [(s["kind"], s["text"], s["media_ref"], s["offset"])
                           for s in spans])
                for v in stateless_doc_checks(doc_id, tuples or None):
                    exp[(doc_id,) + tuple(v)] += 1
                if include_fsm:
                    for v in validate_spans(tuples or []):
                        exp[(doc_id,) + tuple(v)] += 1
            return exp

        def compare(label: str, viol_df, expected: Counter) -> bool:
            got = Counter(
                (r.doc_id, r.span_idx, r.offset, r.check_code, r.severity,
                 r.message) for r in viol_df.collect())
            ok = got == expected
            print(f"seed {seed} [{label}]: {sum(got.values())} rows, "
                  f"multiset parity: {ok}")
            if not ok:
                for k in [k for k in (got | expected)
                          if got[k] != expected[k]][:10]:
                    print(f"  engine={got[k]} oracle={expected[k]}: {k}")
            return ok

        # leg 1: the fused Arrow pass (FSM + stateless battery)
        viol, _ = split_sequence_output(sequence_pass(docs, fused=True))
        ok1 = compare("fused pass", viol, oracle(include_fsm=True))
        # leg 2: the standalone Column-expression battery — a THIRD
        # implementation of the stateless rules (this leg found the NULL
        # offset and NULL-kind E73 three-valued-logic divergences)
        from fastpasta_spark.operators.sanity import sanity_violations

        ok2 = compare("sanity battery", sanity_violations(docs),
                      oracle(include_fsm=False))
        # leg 3: the opt-in trigger-period (E45) path
        PERIOD = 198
        expected_tp: Counter = Counter()
        for doc_id, spans in rows:
            tuples = (None if spans is None else
                      [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in spans])
            for v in stateless_doc_checks(doc_id, tuples or None):
                expected_tp[(doc_id,) + tuple(v)] += 1
            for v in validate_spans(tuples or [], trigger_period=PERIOD):
                expected_tp[(doc_id,) + tuple(v)] += 1
        viol_tp, _ = split_sequence_output(
            sequence_pass(docs, fused=True, trigger_period=PERIOD))
        ok3 = compare(f"fused + trigger_period={PERIOD}", viol_tp, expected_tp)
        # leg 4: the ALPIDE readout-flag/APE census over the same hostile
        # rows (stats partials, not violations — invisible to legs 1-3)
        from fastpasta_spark.functions.fsm import (
            _int_field, ape_census_name, log_readout_flags, parse_kv)

        exp_census: dict[str, int] = {}
        for _doc_id, spans in rows:
            for s in spans or []:
                if (s["kind"] in (S.KIND_TEXT, S.KIND_MEDIA)
                        and (s["text"] or "").startswith("lane=")):
                    fields = parse_kv(s["text"])
                    rf = _int_field(fields, "rf")
                    if rf is not None:
                        log_readout_flags(rf, exp_census)
                    if "ape" in fields:
                        nm = ape_census_name(_int_field(fields, "ape"))
                        if nm:
                            exp_census[nm] = exp_census.get(nm, 0) + 1
        _, stats = split_sequence_output(sequence_pass(docs, fused=True))
        got_census = {r.name[len("alpide_"):]: int(r.value)
                      for r in stats.collect()
                      if r.name.startswith("alpide_")}
        ok4 = got_census == exp_census
        print(f"seed {seed} [alpide census]: "
              f"{sum(got_census.values())} counts, parity: {ok4}")
        if not ok4:
            for k in set(got_census) | set(exp_census):
                if got_census.get(k) != exp_census.get(k):
                    print(f"  {k}: engine={got_census.get(k)} "
                          f"oracle={exp_census.get(k)}")
        # leg 5: config-driven chip-layer overrides (round-4
        # CustomChecksConfig): chips_per_lane replaces every header-
        # derived chips= expectation (E9004) and legal_chip_orderings
        # REPLACES the strictly-increasing legality (E9005) — [9, 8] is
        # legal under this config while the vocabulary's increasing
        # [8, 9] becomes illegal, so the replacement semantics (not just
        # the happy path) are exercised in BOTH implementations
        CPL, ORDS = 2, [[0, 1], [9, 8]]
        expected_cfg: Counter = Counter()
        for doc_id, spans in rows:
            tuples = (None if spans is None else
                      [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in spans])
            for v in stateless_doc_checks(doc_id, tuples or None):
                expected_cfg[(doc_id,) + tuple(v)] += 1
            for v in validate_spans(tuples or [], chips_per_lane=CPL,
                                    legal_chip_orderings=ORDS):
                expected_cfg[(doc_id,) + tuple(v)] += 1
        viol_cfg, _ = split_sequence_output(sequence_pass(
            docs, fused=True, chips_per_lane=CPL,
            legal_chip_orderings=ORDS))
        ok5 = compare(f"fused + chip config cpl={CPL}", viol_cfg,
                      expected_cfg)
        # leg 6 (round 5): the in-pass E110 referential check — a
        # seed-derived valid-id set covering roughly half the ref
        # vocabulary, so dangling/valid/empty/NULL refs and refs on
        # non-media spans are all exercised against the pure twin
        # (stateless_doc_checks(valid_media_ids=))
        rngv = random.Random(seed ^ 0xE110)
        valid = frozenset(r for r in sorted(set(REFS), key=str)
                          if r and rngv.random() < 0.5)
        expected_ref: Counter = Counter()
        for doc_id, spans in rows:
            tuples = (None if spans is None else
                      [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in spans])
            for v in stateless_doc_checks(doc_id, tuples or None,
                                          valid_media_ids=valid):
                expected_ref[(doc_id,) + tuple(v)] += 1
            for v in validate_spans(tuples or []):
                expected_ref[(doc_id,) + tuple(v)] += 1
        viol_ref, _ = split_sequence_output(sequence_pass(
            docs, fused=True, valid_media_ids=valid))
        ok6 = compare(f"fused + referential |valid|={len(valid)}",
                      viol_ref, expected_ref)
        # leg 7 (round 6): RANDOMIZED config — leg 5 fuzzes the data
        # under one fixed config; this leg draws the config itself from
        # the seed (chips_per_lane incl. None/0, random orderings of
        # random lengths incl. duplicates and non-increasing runs, a
        # random trigger period, and a random valid-id set — all FOUR
        # knobs compounded in one run) so config-dependent branches are
        # fuzzed against the pure twin under configs nobody hand-picked
        rngc = random.Random(seed ^ 0x9005)
        cpl7 = rngc.choice([None, 0, 1, 2, 3, 4])
        n_ords = rngc.randint(0, 4)
        ords7 = ([[rngc.randint(0, 9) for _ in range(rngc.randint(1, 4))]
                  for _ in range(n_ords)] if n_ords else None)
        tp7 = rngc.choice([None, 1, 7, 198, 3563])
        valid7 = frozenset(r for r in sorted(set(REFS), key=str)
                           if r and rngc.random() < 0.5)
        expected_r7: Counter = Counter()
        for doc_id, spans in rows:
            tuples = (None if spans is None else
                      [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in spans])
            for v in stateless_doc_checks(doc_id, tuples or None,
                                          valid_media_ids=valid7):
                expected_r7[(doc_id,) + tuple(v)] += 1
            for v in validate_spans(tuples or [], trigger_period=tp7,
                                    chips_per_lane=cpl7,
                                    legal_chip_orderings=ords7):
                expected_r7[(doc_id,) + tuple(v)] += 1
        viol_r7, _ = split_sequence_output(sequence_pass(
            docs, fused=True, trigger_period=tp7, chips_per_lane=cpl7,
            legal_chip_orderings=ords7, valid_media_ids=valid7))
        ok7 = compare(
            f"fused + random config cpl={cpl7} ords={ords7} tp={tp7} "
            f"|valid|={len(valid7)}", viol_r7, expected_r7)
        if not (ok1 and ok2 and ok3 and ok4 and ok5 and ok6 and ok7):
            rc = 1
    return rc


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    sys.exit(main(args[0] if args else 30_000,
                  tuple(args[1:]) or (7, 99, 2026)))
