"""Declared schemas, the span-kind alphabet, and stable error codes.

The data model follows BASELINE.json's ``input_hint``: an Iceberg-style
table of interleaved text + media documents

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

which is the Spark mapping of the reference's CDP stream (RDH header ->
doc-level columns, GBT word sequence -> spans array; see SURVEY.md §1.2
and /root/reference/alice_protocol_reader/src/rdh/rdh_cru.rs:50-63 for
the original fixed binary schema). Schemas are DECLARED, never inferred
— mirroring the reference's fixed protocol schema.

Error codes are stable strings in the reference's ``[Exx]`` style
(fastpasta/src/stats/error_stats.rs:176-194 parses codes with the regex
``\\[E(\\d{2,4})\\]`` — ours match that contract).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Span-kind alphabet (grammar alphabet; analogue of the GBT word IDs,
# reference: fastpasta/src/words/its/status_words/*.rs, data_words.rs:80-100)
# ---------------------------------------------------------------------------

KIND_HEADER = "header"    # IHW 0xE0 — opens a doc section
KIND_TRIG = "trig"        # TDH 0xE8 — section trigger header
KIND_TEXT = "text"        # IB/OB data word — content span
KIND_MEDIA = "media"      # data word with media reference
KIND_CALIB = "calib"      # CDW 0xF8 — only valid at section start
KIND_TRAILER = "trailer"  # TDT 0xF0 — closes a section
KIND_DIAG = "diag"        # DDW0 0xE4 — doc footer, only valid last
KIND_PAD = "pad"          # 0xFF flush padding — only valid as a trailing
                          # run after the last closed frame / diag

VALID_KINDS = [
    KIND_HEADER,
    KIND_TRIG,
    KIND_TEXT,
    KIND_MEDIA,
    KIND_CALIB,
    KIND_TRAILER,
    KIND_DIAG,
    KIND_PAD,  # appended LAST: existing kind-code indices stay stable
]

CONTENT_KINDS = [KIND_TEXT, KIND_MEDIA, KIND_CALIB]

# ---------------------------------------------------------------------------
# Declared schemas (StructType, no inference)
# ---------------------------------------------------------------------------

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mtype", T.StringType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

# Violation rows mirror the reference's `OFFSET: [Exx] message` error rows
# (fastpasta/src/stats/error_stats.rs:36-47 sorts them by memory position;
# we sort by (doc_id, offset, check_code)).
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("span_idx", T.IntegerType(), True),
        T.StructField("offset", T.IntegerType(), True),
        T.StructField("check_code", T.StringType(), True),
        T.StructField("severity", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)

# Metrics rows mirror the stats JSON golden file
# (fastpasta/src/stats/stats_collector.rs:161-175).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("docs_seen", T.LongType(), False),
        T.StructField("spans_seen", T.LongType(), False),
        T.StructField("violations", T.LongType(), False),
        T.StructField("verdict", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Error codes (stable; [Exx] style per reference error_stats.rs contract)
# ---------------------------------------------------------------------------

SEV_ERROR = "ERROR"
SEV_WARNING = "WARNING"
SEV_FATAL = "FATAL"

# Doc-level sanity (RDH sanity analogue, validators/rdh.rs:130-160)
E10_DOC_ID_NULL = "E10"          # doc_id null/empty
E11_OFFSET_SEQUENCE = "E11"      # offsets not 0..n-1 strictly increasing gapless
E12_SPANS_NULL = "E12"           # spans array null or empty
E13_DOC_ID_FORMAT = "E13"        # doc_id malformed (non-conforming key)

# Span-level stateless sanity (status-word sanity analogues E30-E70)
E30_HEADER_SANITY = "E30"        # header span malformed (ihw.rs:1-55)
E40_TRIG_SANITY = "E40"          # trig span malformed (tdh.rs:13-51)
E50_TRAILER_SANITY = "E50"       # trailer span malformed (tdt.rs:1-85)
E60_DIAG_SANITY = "E60"          # diag span malformed / misplaced (ddw.rs:1-92)
E61_DIAG_FIELDS = "E61"          # diag checked fields invalid: resv= must be 0,
                                 # idx= must be an integer >= 1 (DDW0 field
                                 # sanity, ddw.rs:9-46 + checks_list.md:94-97:
                                 # "reserved == 0", "index >= 1"). Opt-in per
                                 # key, so field-less diag footers are no-ops
E70_INVALID_KIND = "E70"         # kind not in alphabet (data_words.rs:12-48)
E71_TEXT_EMPTY = "E71"           # text-kind span with empty/null text
E72_MEDIA_REF_MISSING = "E72"    # media-kind span with empty media_ref
E73_UNEXPECTED_REF = "E73"       # non-media span carrying a media_ref
E81_CALIB_POSITION = "E81"       # calib span not at section start (cdp_running.rs:317-332)
E74_PAD_NOT_EMPTY = "E74"        # pad span carrying text/media_ref (padding gate:
                                 # flush padding must be pure 0xFF, lib.rs padding
                                 # sanity analogue)
E82_PAD_POSITION = "E82"         # pad span inside an open frame, or a non-pad
                                 # span after padding began (padding is only
                                 # legal as a trailing run)

E45_TRIGGER_PERIOD = "E45"       # trig bc period != user-specified period between
                                 # internal triggers (tdh.rs:60-109, driven from
                                 # cdp_running.rs:400-427; mod-3564 wraparound)

# Running header/trig field checks over opt-in counters (R1-R3 true
# docs-model form; rdh_running.rs pages-counter / same-fields /
# orbit-after-stop analogues). Opt-in: only headers carrying page= /
# trigs carrying orbit= participate, so counter-less corpora are no-ops.
E31_PAGE_COUNTER = "E31"         # header page= not previous+1 (first must be 0)
E32_PAGE_FIELDS = "E32"          # header fields (lanes=) changed when page > 0
E441_ORBIT_NO_STOP = "E441"      # trig orbit= decreased, or changed while the
                                 # previous trailer had done=0 (orbit may only
                                 # advance after a stop)

# Sequence / FSM (its_payload_fsm_cont.rs:24-81 analogues)
E990_FSM_UNEXPECTED = "E990"     # word not legal in current FSM state
E991_FSM_UNCLOSED = "E991"       # document ended with an open section
E992_FSM_ORPHAN_CLOSE = "E992"   # trailer closing a never-opened section (E59 analogue)
E440_BC_NOT_MONOTONE = "E440"    # trig bc decreased vs previous trig (tdh.rs:115-122)
E41_CONTINUATION = "E41"         # trig cont=1 not preceded by trailer done=0
E701_EMPTY_FRAME = "E701"        # section closed with zero content spans (readout_frame.rs:96-100)
E702_LANE_COUNT = "E702"         # frame content count != header-declared lanes
                                 # (A1 analogue: alpide_readout_frame.rs:53-130
                                 #  expected lane cardinality per frame)
E703_DUP_REF_IN_FRAME = "E703"   # same media_ref twice within one frame
                                 # (A6 analogue: chip-ID order/uniqueness,
                                 #  lane_alpide_frame_analyzer.rs:288-320)
E704_LANE_NOT_DECLARED = "E704"  # content span lane id not in the header-declared
                                 # lane set (membership, not just count; analogue of
                                 # words/its/status_words/util.rs:184-189, ib.rs:14-22)
E705_LANE_ORDER = "E705"         # lane ids within a frame not non-decreasing
                                 # (legal-lane-grouping analogue,
                                 #  alpide_readout_frame.rs:94-130)

# Chip layer — the third nesting level (doc -> frame -> lane span -> chips;
# analogue of per-lane ALPIDE decode, lane_alpide_frame_analyzer.rs:91-320)
E9003_CHIP_BC_MISMATCH = "E9003"  # chip bunch counters differ across a frame's lanes
E9004_CHIP_COUNT = "E9004"        # chip count != header-declared chips per lane
E9005_CHIP_ORDER = "E9005"        # chip ids not strictly increasing within a lane
E9006_LANE_FATAL = "E9006"        # undecodable chip stream -> lane FATAL; the lane is
                                  # excluded from expected-lane accounting for the rest
                                  # of the doc (readout_frame.rs:40-50 fatal_lanes)
E9007_APE = "E9007"               # ALPIDE protocol extension word on a lane span
                                  # (ape=<byte>): severity per the APE table
                                  # (alpide_word.rs:35-49) — WARNING APEs report only,
                                  # FATAL APEs also put the lane in the running fatal
                                  # set (lane_alpide_frame_analyzer.rs:149-170);
                                  # unknown bytes -> WARNING (reference log-warns)

# Relational checks (north_rule extensions)
E100_DUPLICATE_KEY = "E100"      # duplicate doc_id (uniqueness)
E110_DANGLING_REF = "E110"       # media_ref unresolved in media table (referential)
E120_DRIFT = "E120"              # distribution drift vs golden profile
E130_GOLDEN_MISMATCH = "E130"    # golden-stats field mismatch (stats/lib.rs:9-31 analogue)
E9001_CUSTOM_CHECK = "E9001"     # user-configured expectation failed
                                 # (custom_checks_cfg.rs:7-28, stats_validation.rs:4-38)

ALL_CODES = [
    E10_DOC_ID_NULL, E11_OFFSET_SEQUENCE, E12_SPANS_NULL, E13_DOC_ID_FORMAT,
    E30_HEADER_SANITY, E40_TRIG_SANITY, E50_TRAILER_SANITY, E60_DIAG_SANITY,
    E61_DIAG_FIELDS,
    E70_INVALID_KIND, E71_TEXT_EMPTY, E72_MEDIA_REF_MISSING, E73_UNEXPECTED_REF,
    E81_CALIB_POSITION, E74_PAD_NOT_EMPTY, E82_PAD_POSITION,
    E990_FSM_UNEXPECTED, E991_FSM_UNCLOSED,
    E992_FSM_ORPHAN_CLOSE, E440_BC_NOT_MONOTONE, E41_CONTINUATION,
    E45_TRIGGER_PERIOD, E31_PAGE_COUNTER, E32_PAGE_FIELDS, E441_ORBIT_NO_STOP,
    E701_EMPTY_FRAME, E702_LANE_COUNT, E703_DUP_REF_IN_FRAME,
    E704_LANE_NOT_DECLARED, E705_LANE_ORDER,
    E9003_CHIP_BC_MISMATCH, E9004_CHIP_COUNT, E9005_CHIP_ORDER,
    E9006_LANE_FATAL, E9007_APE,
    E100_DUPLICATE_KEY, E110_DANGLING_REF,
    E120_DRIFT, E130_GOLDEN_MISMATCH, E9001_CUSTOM_CHECK,
]
