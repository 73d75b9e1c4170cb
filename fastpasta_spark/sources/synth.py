"""Deterministic synthetic corpus generator for the interleaved-docs table.

Plays the role of the reference's 18 curated raw test files
(`/root/reference/fastpasta/tests/util/mod.rs:19-36` — one good/bad
scenario per file with golden error positions/codes/counts). Here every
document is a pure function of (seed, doc_index): generation is
distributed via ``mapInPandas`` over ``spark.range`` and is therefore
independent of partitioning — the same corpus comes out at any
parallelism, which is what makes golden tests and the two-cluster-size
scaling bench byte-stable.

Violation injection mirrors FIXTURES.md's fixture families (bad_kind,
bad_sequence, bad_offsets, bad_fields, dup_keys, dangling_refs,
empty_frames, ...) — a corrupted doc's mutation class is chosen by its
own hash, so each class appears at a stable rate.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpasta_spark import schema as S

MASK64 = (1 << 64) - 1

# bump when generated output changes — benchmark corpus caches embed this
GENERATOR_VERSION = 3

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data span frame check batch"
).split()

# mutation classes for corrupted docs (stable order — golden tests depend on it)
MUT_BAD_KIND = 0          # invalid span kind            -> E70
MUT_SWAP_FIRST = 1        # trailer-before-header        -> E992/E990
MUT_OFFSET_GAP = 2        # offset gap after midpoint    -> E11
MUT_EMPTY_TEXT = 3        # text span with empty text    -> E71
MUT_DANGLING_REF = 4      # media_ref not in media table -> E110
MUT_BC_DECREASE = 5       # trig bc decreases            -> E440
MUT_CALIB_MISPLACED = 6   # calib after content          -> E81
MUT_DROP_TRAILER = 7      # last frame never closed      -> E991
MUT_DIAG_EARLY = 8        # diag before last frame       -> E990/E60
MUT_EMPTY_FRAME = 9       # frame with no content spans  -> E701
MUT_BAD_CONT = 10         # trig cont=1 after done=1     -> E41
MUT_BAD_FIELDS = 11       # malformed trig text          -> E40
MUT_LANE_MISMATCH = 12    # header lanes= wrong count    -> E702
MUT_DUP_REF = 13          # same media_ref twice in frame -> E703
N_MUTATIONS = 14          # default rotation (pre-lane-layer classes;
                          # golden corpora depend on this staying 14)

# lane-layer / trigger-period mutation classes (only meaningful on
# corpora generated with trigger_period / lane_layer set; select them
# via CorpusConfig.mutation_classes)
MUT_BAD_PERIOD = 14       # internal-trig bc off-period   -> E45
MUT_LANE_UNDECLARED = 15  # content lane not in lane_ids  -> E704
MUT_LANE_ORDER = 16       # lanes out of order in frame   -> E705
MUT_CHIP_COUNT = 17       # chip count != declared        -> E9004
MUT_CHIP_ORDER = 18       # chip ids not increasing       -> E9005
MUT_CHIP_BC = 19          # one lane's cbc differs        -> E9003
MUT_FATAL_LANE = 20       # undecodable chips -> E9006 FATAL; the lane's
                          # spans vanish from later frames (propagation:
                          # no E702 because expected count drops)
# page/orbit running-counter classes (corpora with page_orbit=True)
MUT_PAGE_SKIP = 21        # 2nd header's page= skips ahead      -> E31
MUT_PAGE_FIELDS = 22      # 2nd header declares different lanes= (frame
                          # content adjusted to match)          -> E32
MUT_ORBIT_NO_STOP = 23    # trailer done=0 but orbit advances   -> E441
# padding-gate classes (corpora with pad_spans=True)
MUT_PAD_INSIDE = 24       # pad span inside an open frame       -> E82
MUT_PAD_DIRTY = 25        # trailing pad carries text           -> E74
# diag checked-field classes (DDW0 field sanity, any corpus)
MUT_DIAG_RESV = 26        # diag resv= nonzero                  -> E61
MUT_DIAG_IDX = 27        # diag idx= < 1                        -> E61
# APE classes (lane_layer corpora; alpide_word.rs severity table)
MUT_APE_WARNING = 28      # lane span ape=0xF2 (strip_start)    -> E9007 WARNING
MUT_APE_FATAL = 29        # lane span ape=0xF4 (det_timeout)    -> E9007 FATAL;
                          # the lane's spans vanish from later frames (A8
                          # propagation keeps E702 quiet)
N_MUTATIONS_ALL = 30


# readout-flag bytes for readout_flags corpora: the three exclusive
# trailer states (0xB8/0xBC/0xBE) + clean + bit-flag combos
_RF_TABLE = (0xB0, 0xB8, 0xBC, 0xBE, 0xB1, 0xB2, 0xB4, 0xB7)


def splitmix64(x: int) -> int:
    """Public-domain splitmix64 — the determinism backbone."""
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return (z ^ (z >> 31)) & MASK64


@dataclass(frozen=True)
class CorpusConfig:
    n_docs: int = 1000
    seed: int = 42
    n_media: int = 256          # media dimension-table cardinality
    corrupt_per_mille: int = 0  # docs corrupted per 1000 (0 = clean corpus)
    dup_per_mille: int = 0      # extra duplicate-doc_id rows per 1000
    hot_key_copies: int = 0     # skew: extra copies of doc 0's key
    # document weight knobs (defaults = historical shape; benches use
    # heavier docs so per-doc compute dominates fixed driver overheads)
    min_frames: int = 1
    max_frames: int = 3
    min_content: int = 1
    max_content: int = 4
    # grammar-v2 knobs (defaults off -> byte-identical v1 corpora)
    trigger_period: int | None = None  # trigs get int=1, bc steps by this
    lane_layer: bool = False           # content spans carry lane=/chips=/cbc=
    chips_per_lane: int = 2
    readout_flags: bool = False        # lane spans also carry rf=<trailer byte>
                                       # (ALPIDE readout-flag census fixture)
    page_orbit: bool = False           # headers carry page=, trigs orbit=
    pad_spans: bool = False            # docs end with a trailing pad run
    # restrict corrupted docs to these mutation classes (None = 0..13)
    mutation_classes: tuple[int, ...] | None = None


def _doc_spans(i: int, cfg: CorpusConfig) -> list[dict]:
    """Clean spans for doc index i — pure function of (seed, i)."""
    h = splitmix64(cfg.seed * 0x51_7C_C1 + i)
    n_frames = cfg.min_frames + h % (cfg.max_frames - cfg.min_frames + 1)
    spans: list[dict] = []
    off = 0

    def push(kind: str, text: str = "", media_ref: str = "") -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    # trigger-period corpora start low and step by exactly the period so
    # clean docs never wrap mod 3564 (keeps E440 monotonicity intact)
    bc = h % 200 if cfg.trigger_period else h % 1000
    hs = h
    for f in range(n_frames):
        hs = splitmix64(hs + f + 1)
        if cfg.page_orbit:
            # constant frame width per doc: the same-fields rule (E32)
            # requires lanes= to be stable across a doc's page sequence
            n_content = cfg.min_content + (h >> 16) % (
                cfg.max_content - cfg.min_content + 1)
        else:
            n_content = cfg.min_content + (hs >> 16) % (
                cfg.max_content - cfg.min_content + 1)
        # header declares the frame's content-span count (A1 analogue:
        # expected lanes per readout frame); lane-layer corpora also
        # declare the lane SET + expected chips per lane (R11/A5 analogue)
        # page_orbit corpora: every header carries the running page
        # counter, every trig the orbit (advances once per frame — every
        # clean trailer is a stop, so the advance is always legal)
        page_sfx = f",page={f}" if cfg.page_orbit else ""
        if cfg.lane_layer:
            ids = ";".join(str(c) for c in range(n_content))
            push(S.KIND_HEADER,
                 f"lanes={n_content},lane_ids={ids},"
                 f"chips={cfg.chips_per_lane}{page_sfx}")
        else:
            push(S.KIND_HEADER, f"lanes={n_content}{page_sfx}")
        orbit_sfx = f",orbit={h % 97 + f}" if cfg.page_orbit else ""
        frame_bc = bc
        if cfg.trigger_period:
            push(S.KIND_TRIG, f"cont=0,bc={bc},int=1{orbit_sfx}")
            bc += cfg.trigger_period
        else:
            push(S.KIND_TRIG, f"cont=0,bc={bc}{orbit_sfx}")
            bc += 1 + (hs >> 8) % 50
        if hs % 5 == 0:
            push(S.KIND_CALIB, "idx=0")
        frame_refs: set[str] = set()
        for c in range(n_content):
            hc = splitmix64(hs + 31 * (c + 1))
            if cfg.lane_layer:
                # lanes ascend 0..n-1; chip ids strictly increasing per
                # lane; cbc equal across the frame's lanes (clean)
                chips = ";".join(str(c * 8 + j)
                                 for j in range(cfg.chips_per_lane))
                rf_sfx = ""
                if cfg.readout_flags:
                    # hits every decode branch deterministically: the 3
                    # exclusive trailer states + bit-flag combinations
                    rf_sfx = f",rf={_RF_TABLE[(hc >> 3) % len(_RF_TABLE)]}"
                push(S.KIND_TEXT,
                     f"lane={c},chips={chips},cbc={frame_bc}{rf_sfx}")
            elif hc % 4 == 0:
                # linear-probe away from refs already used in this frame
                # (duplicate ref within a frame is the E703 violation —
                # clean docs must not produce it by collision)
                k = hc % cfg.n_media
                while f"m{k}" in frame_refs:
                    k = (k + 1) % cfg.n_media
                frame_refs.add(f"m{k}")
                push(S.KIND_MEDIA, "", f"m{k}")
            else:
                words = " ".join(_VOCAB[(hc >> (7 * w)) % len(_VOCAB)] for w in range(2 + hc % 5))
                push(S.KIND_TEXT, words)
        push(S.KIND_TRAILER, "done=1")
    if h % 3 == 0:
        push(S.KIND_DIAG, "ok")
    if cfg.pad_spans:
        for _ in range(1 + h % 2):
            push(S.KIND_PAD)
    return spans


def _mutate(spans: list[dict], mut: int, h: int, cfg: CorpusConfig) -> list[dict]:
    """Apply one deterministic mutation class (in-place edits on copies)."""
    spans = [dict(s) for s in spans]
    if mut == MUT_BAD_KIND:
        idx = next((k for k, s in enumerate(spans) if s["kind"] == S.KIND_TEXT), 0)
        spans[idx]["kind"] = "junk"
    elif mut == MUT_SWAP_FIRST and len(spans) >= 3:
        # move a trailer to the front: orphan close + reordered grammar
        t_idx = next((k for k, s in enumerate(spans) if s["kind"] == S.KIND_TRAILER), None)
        if t_idx is not None:
            tr = spans.pop(t_idx)
            spans.insert(0, tr)
            for k, s in enumerate(spans):
                s["offset"] = k
    elif mut == MUT_OFFSET_GAP:
        mid = len(spans) // 2
        for s in spans[mid:]:
            s["offset"] += 2
    elif mut == MUT_EMPTY_TEXT:
        idx = next((k for k, s in enumerate(spans) if s["kind"] == S.KIND_TEXT), None)
        if idx is not None:
            spans[idx]["text"] = ""
    elif mut == MUT_DANGLING_REF:
        idx = next((k for k, s in enumerate(spans) if s["kind"] == S.KIND_MEDIA), None)
        if idx is None:
            idx = next(k for k, s in enumerate(spans) if s["kind"] == S.KIND_TEXT)
            spans[idx]["kind"] = S.KIND_MEDIA
            spans[idx]["text"] = ""
        spans[idx]["media_ref"] = f"missing_{h % 100}"
    elif mut == MUT_BC_DECREASE:
        trigs = [k for k, s in enumerate(spans) if s["kind"] == S.KIND_TRIG]
        if len(trigs) >= 2:
            spans[trigs[1]]["text"] = "cont=0,bc=0"
        else:
            spans[trigs[0]]["text"] = "cont=1,bc=5"  # cont=1 after header -> E41
    elif mut == MUT_CALIB_MISPLACED:
        t_idx = next((k for k, s in enumerate(spans) if s["kind"] == S.KIND_TEXT), None)
        if t_idx is not None:
            spans.insert(t_idx + 1,
                         {"kind": S.KIND_CALIB, "text": "idx=1", "media_ref": "",
                          "offset": 0})
            for k, s in enumerate(spans):
                s["offset"] = k
    elif mut == MUT_DROP_TRAILER:
        t_idx = max(k for k, s in enumerate(spans) if s["kind"] == S.KIND_TRAILER)
        spans.pop(t_idx)
        for k, s in enumerate(spans):
            s["offset"] = k
    elif mut == MUT_DIAG_EARLY:
        spans.insert(1, {"kind": S.KIND_DIAG, "text": "ok", "media_ref": "", "offset": 0})
        for k, s in enumerate(spans):
            s["offset"] = k
    elif mut == MUT_EMPTY_FRAME:
        # strip content spans of the first frame
        out, in_first, done_first = [], False, False
        for s in spans:
            if s["kind"] == S.KIND_HEADER and not done_first:
                in_first = True
            if in_first and not done_first and s["kind"] in (S.KIND_TEXT, S.KIND_MEDIA,
                                                             S.KIND_CALIB):
                continue
            if in_first and s["kind"] == S.KIND_TRAILER:
                done_first = True
            out.append(s)
        spans = out
        for k, s in enumerate(spans):
            s["offset"] = k
    elif mut == MUT_BAD_CONT:
        trigs = [k for k, s in enumerate(spans) if s["kind"] == S.KIND_TRIG]
        if len(trigs) >= 2:
            fields = spans[trigs[1]]["text"].split(",bc=")
            spans[trigs[1]]["text"] = f"cont=1,bc={fields[1]}"
            # remove the header between frames so trig lands in CLOSED state
            hdr = trigs[1] - 1
            if spans[hdr]["kind"] == S.KIND_HEADER:
                spans.pop(hdr)
                for k, s in enumerate(spans):
                    s["offset"] = k
        else:
            spans[trigs[0]]["text"] = "cont=1,bc=7"
    elif mut == MUT_BAD_FIELDS:
        idx = next(k for k, s in enumerate(spans) if s["kind"] == S.KIND_TRIG)
        spans[idx]["text"] = "garbage"
    elif mut == MUT_LANE_MISMATCH:
        idx = next(k for k, s in enumerate(spans) if s["kind"] == S.KIND_HEADER)
        declared = int(spans[idx]["text"].split("=")[1])
        spans[idx]["text"] = f"lanes={declared + 1 + h % 3}"
    elif mut == MUT_BAD_PERIOD:
        # bump the 2nd internal trig's bc by 1..7 (< any sane period, so
        # monotonicity holds and ONLY the period checks fire: one E45 at
        # this trig and one at the next, if any — both deterministic)
        trigs = [k for k, s in enumerate(spans)
                 if s["kind"] == S.KIND_TRIG and "int=1" in s["text"]]
        if len(trigs) >= 2:
            parts = dict(p.split("=", 1) for p in spans[trigs[1]]["text"].split(","))
            bumped = int(parts["bc"]) + 1 + h % 7
            spans[trigs[1]]["text"] = f"cont={parts['cont']},bc={bumped},int=1"
    elif mut in (MUT_LANE_UNDECLARED, MUT_CHIP_COUNT, MUT_CHIP_ORDER,
                 MUT_CHIP_BC, MUT_FATAL_LANE):
        lanes_idx = [k for k, s in enumerate(spans)
                     if s["text"].startswith("lane=")]
        if lanes_idx:
            if mut == MUT_LANE_UNDECLARED:
                # LAST lane span of the first frame -> undeclared id (and
                # larger than any declared, so E705 order stays quiet)
                first_frame = [k for k in lanes_idx
                               if all(spans[j]["kind"] != S.KIND_TRAILER
                                      for j in range(lanes_idx[0], k))]
                k = first_frame[-1]
                parts = dict(p.split("=", 1) for p in spans[k]["text"].split(","))
                parts["lane"] = str(9 + h % 3)
                spans[k]["text"] = (f"lane={parts['lane']},chips={parts['chips']},"
                                    f"cbc={parts['cbc']}")
            elif mut == MUT_CHIP_COUNT:
                k = lanes_idx[0]
                parts = dict(p.split("=", 1) for p in spans[k]["text"].split(","))
                chips = parts["chips"].split(";")[:-1] or ["0"]
                spans[k]["text"] = (f"lane={parts['lane']},"
                                    f"chips={';'.join(chips)},cbc={parts['cbc']}")
            elif mut == MUT_CHIP_ORDER:
                k = lanes_idx[0]
                parts = dict(p.split("=", 1) for p in spans[k]["text"].split(","))
                chips = list(reversed(parts["chips"].split(";")))
                spans[k]["text"] = (f"lane={parts['lane']},"
                                    f"chips={';'.join(chips)},cbc={parts['cbc']}")
            elif mut == MUT_CHIP_BC:
                k = lanes_idx[0]
                parts = dict(p.split("=", 1) for p in spans[k]["text"].split(","))
                spans[k]["text"] = (f"lane={parts['lane']},chips={parts['chips']},"
                                    f"cbc={int(parts['cbc']) + 1}")
            else:  # MUT_FATAL_LANE: first frame's lane 0 goes FATAL; its
                # spans vanish from LATER frames — with correct A8
                # propagation the later frames' E702 stays quiet
                k = lanes_idx[0]
                parts = dict(p.split("=", 1) for p in spans[k]["text"].split(","))
                fatal_lane = parts["lane"]
                spans[k]["text"] = (f"lane={fatal_lane},chips=x;y,"
                                    f"cbc={parts['cbc']}")
                first_trailer = next(j for j in range(k, len(spans))
                                     if spans[j]["kind"] == S.KIND_TRAILER)
                spans = [s for j, s in enumerate(spans)
                         if j <= first_trailer
                         or not s["text"].startswith(f"lane={fatal_lane},")]
                for k2, s in enumerate(spans):
                    s["offset"] = k2
    elif mut == MUT_LANE_ORDER:
        # swap the text payloads of the first two lane spans in one frame
        # (chips/cbc travel with the lane -> ONLY the order check fires)
        lanes_idx = [k for k, s in enumerate(spans)
                     if s["text"].startswith("lane=")]
        for a, b in zip(lanes_idx, lanes_idx[1:]):
            adjacent = all(spans[j]["kind"] != S.KIND_TRAILER
                           for j in range(a, b))
            if adjacent:
                spans[a]["text"], spans[b]["text"] = (spans[b]["text"],
                                                      spans[a]["text"])
                break
    elif mut == MUT_PAGE_SKIP:
        # bump the 2nd header's page= so the counter skips -> E31 there
        # (and at the following header, if any — both deterministic)
        hdrs = [k for k, s in enumerate(spans)
                if s["kind"] == S.KIND_HEADER and ",page=" in s["text"]]
        if len(hdrs) >= 2:
            parts = spans[hdrs[1]]["text"].split(",")
            parts = [f"page={int(p[5:]) + 1 + h % 3}" if p.startswith("page=")
                     else p for p in parts]
            spans[hdrs[1]]["text"] = ",".join(parts)
    elif mut == MUT_PAGE_FIELDS:
        # 2nd header declares lanes+1 AND its frame gains one text span,
        # so the count matches and ONLY the same-fields check fires (E32)
        hdrs = [k for k, s in enumerate(spans)
                if s["kind"] == S.KIND_HEADER and ",page=" in s["text"]]
        if len(hdrs) >= 2:
            k = hdrs[1]
            parts = spans[k]["text"].split(",")
            parts = [f"lanes={int(p[6:]) + 1}" if p.startswith("lanes=")
                     else p for p in parts]
            spans[k]["text"] = ",".join(parts)
            t_idx = next(j for j in range(k, len(spans))
                         if spans[j]["kind"] == S.KIND_TRAILER)
            spans.insert(t_idx, {"kind": S.KIND_TEXT, "text": "pad span text",
                                 "media_ref": "", "offset": 0})
            for k2, s in enumerate(spans):
                s["offset"] = k2
    elif mut == MUT_ORBIT_NO_STOP:
        # first trailer loses its stop bit while the next frame's orbit
        # still advances -> E441 at that frame's trig
        trailers = [k for k, s in enumerate(spans)
                    if s["kind"] == S.KIND_TRAILER]
        if len(trailers) >= 2:
            spans[trailers[0]]["text"] = "done=0"
    elif mut == MUT_PAD_INSIDE:
        # pad span right after the first trig -> one E82 (mid-frame pad)
        t_idx = next((k for k, s in enumerate(spans)
                      if s["kind"] == S.KIND_TRIG), None)
        if t_idx is not None:
            spans.insert(t_idx + 1, {"kind": S.KIND_PAD, "text": "",
                                     "media_ref": "", "offset": 0})
            for k2, s in enumerate(spans):
                s["offset"] = k2
    elif mut == MUT_PAD_DIRTY:
        # first trailing pad carries text -> E74 (stateless battery)
        p_idx = next((k for k, s in enumerate(spans)
                      if s["kind"] == S.KIND_PAD), None)
        if p_idx is not None:
            spans[p_idx]["text"] = "deadbeef"
    elif mut in (MUT_APE_WARNING, MUT_APE_FATAL):
        lanes_idx = [k for k, s in enumerate(spans)
                     if s["text"].startswith("lane=")]
        if lanes_idx:
            k = lanes_idx[0]
            if mut == MUT_APE_WARNING:
                spans[k]["text"] += f",ape={0xF2}"
            else:
                # fatal APE on the first frame's first lane; its spans
                # vanish from LATER frames (fatal set snapshot at open
                # means the CURRENT frame still expects it)
                parts = dict(p.split("=", 1) for p in spans[k]["text"].split(","))
                fatal_lane = parts["lane"]
                spans[k]["text"] += f",ape={0xF4}"
                first_trailer = next(j for j in range(k, len(spans))
                                     if spans[j]["kind"] == S.KIND_TRAILER)
                spans = [s for j, s in enumerate(spans)
                         if j <= first_trailer
                         or not s["text"].startswith(f"lane={fatal_lane},")]
                for k2, s in enumerate(spans):
                    s["offset"] = k2
    elif mut in (MUT_DIAG_RESV, MUT_DIAG_IDX):
        # corrupt (or add) the diag footer's checked fields; insertion
        # goes BEFORE any trailing pad run so only E61 fires (padding
        # after diag stays legal)
        bad = "idx=1,resv=5" if mut == MUT_DIAG_RESV else f"idx={-(h % 2)},resv=0"
        d_idx = next((k for k, s in enumerate(spans)
                      if s["kind"] == S.KIND_DIAG), None)
        if d_idx is not None:
            spans[d_idx]["text"] = bad
        else:
            ins = len(spans)
            while ins > 0 and spans[ins - 1]["kind"] == S.KIND_PAD:
                ins -= 1
            spans.insert(ins, {"kind": S.KIND_DIAG, "text": bad,
                               "media_ref": "", "offset": 0})
            for k, s in enumerate(spans):
                s["offset"] = k
    elif mut == MUT_DUP_REF:
        # duplicate a media ref within its frame (or convert the first
        # text span); the lanes count is bumped so only E703 fires
        m_idx = next((k for k, s in enumerate(spans) if s["kind"] == S.KIND_MEDIA),
                     None)
        if m_idx is None:
            m_idx = next(k for k, s in enumerate(spans) if s["kind"] == S.KIND_TEXT)
            spans[m_idx] = {"kind": S.KIND_MEDIA, "text": "",
                            "media_ref": f"m{h % 8}", "offset": 0}
        dup = dict(spans[m_idx])
        spans.insert(m_idx + 1, dup)
        h_idx = max(k for k in range(m_idx) if spans[k]["kind"] == S.KIND_HEADER)
        declared = int(spans[h_idx]["text"].split("=")[1])
        spans[h_idx]["text"] = f"lanes={declared + 1}"
        for k, s in enumerate(spans):
            s["offset"] = k
    return spans


def gen_doc(i: int, cfg: CorpusConfig) -> tuple[str, list[dict], int]:
    """(doc_id, spans, mutation_class|-1) for logical doc index i."""
    spans = _doc_spans(i, cfg)
    h = splitmix64(cfg.seed * 0xA5A5 + i * 3 + 1)
    mut = -1
    if cfg.corrupt_per_mille and (h % 1000) < cfg.corrupt_per_mille:
        # default rotation = classes 0..13 (indexing unchanged since v1,
        # so pre-lane-layer corpora stay byte-identical)
        classes = cfg.mutation_classes or tuple(range(N_MUTATIONS))
        mut = classes[splitmix64(h) % len(classes)]
        spans = _mutate(spans, mut, h, cfg)
    return f"doc{i:010d}", spans, mut


def corpus_df(spark: SparkSession, cfg: CorpusConfig) -> DataFrame:
    """Distributed docs table (doc_id, spans) — declared schema, seeded.

    Duplicate-key and hot-key rows are appended as extra logical indices
    mapped back onto existing doc_ids (uniqueness/skew fixtures).
    """
    n_extra_dup = cfg.n_docs * cfg.dup_per_mille // 1000
    total = cfg.n_docs + n_extra_dup + cfg.hot_key_copies
    base, n_docs, hot = cfg.n_docs, cfg.n_docs, cfg.hot_key_copies
    conf = cfg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i < n_docs:
                    logical = i
                elif i < base + n_extra_dup:
                    # duplicate of an existing doc (same doc_id AND same spans)
                    logical = splitmix64(conf.seed + i) % n_docs
                else:
                    logical = 0 if hot else i % n_docs  # hot key: doc 0
                doc_id, spans, _ = gen_doc(logical, conf)
                rows.append((doc_id, spans))
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    rng = spark.range(0, total, 1, numPartitions=max(1, min(256, total // 512 + 1)))
    return rng.mapInPandas(gen, schema=S.DOCS_SCHEMA)


def media_df(spark: SparkSession, cfg: CorpusConfig) -> DataFrame:
    """Media dimension table — small, broadcast-joinable."""
    mtypes = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return (
        spark.range(0, cfg.n_media)
        .select(
            F.concat(F.lit("m"), F.col("id")).alias("media_id"),
            F.element_at(mtypes, (F.col("id") % 3 + 1).cast("int")).alias("mtype"),
            (F.col("id") * 1024 + 17).alias("bytes"),
        )
    )
