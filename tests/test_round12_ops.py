"""Semantic tests for the round-12 operators (beyond the smoke run and
the DuckDB oracle): each pins a property a silent bug would break
without changing row counts."""

from __future__ import annotations

import collections

from df_spark.queries import load_registry
from df_spark.sources.tables import load_sdf

REG = load_registry()


# --------------------------------------------------------------------
# media_near_dup: perceptual-hash image dedup
# --------------------------------------------------------------------

def _phash_twin(text: str, W: int = 18, H: int = 16):
    """Independent dHash/aHash twin straight from the text — never
    builds a BMP, so agreement with the engine proves the whole
    encode -> container -> decode -> hash chain preserved every pixel
    (orientation, BGR order, scanline padding)."""
    vals = [ord(ch) % 256 for ch in text]
    n = len(vals)

    def px(x, y, c):
        i = (y * W + x) * 3 + c
        return vals[i] if i < n else 0

    def gray(x, y):
        return (px(x, y, 0) + px(x, y, 1) + px(x, y, 2)) // 3

    cell = [
        [
            gray(2 * gx, 2 * gy) + gray(2 * gx + 1, 2 * gy)
            + gray(2 * gx, 2 * gy + 1) + gray(2 * gx + 1, 2 * gy + 1)
            for gx in range(9)
        ]
        for gy in range(8)
    ]
    tot = sum(cell[r][x] for r in range(8) for x in range(8))
    dband, aband = [0] * 4, [0] * 4
    for r in range(8):
        for x in range(8):
            pos = (r % 2) * 8 + x
            if cell[r][x] > cell[r][x + 1]:
                dband[r // 2] |= 1 << pos
            if 64 * cell[r][x] > tot:
                aband[r // 2] |= 1 << pos
    return dband, aband


def test_media_phash_matches_text_twin(spark, sf_dir):
    from df_spark.multimodal import bmp_perceptual_hashes, documents_as_bmp

    docs = load_sdf(spark, sf_dir, "documents")
    got = {
        r.media_id: r
        for r in bmp_perceptual_hashes(documents_as_bmp(docs)).collect()
    }
    checked = 0
    for d in docs.collect():
        if len(d.text) == 0:
            assert d.doc_id not in got
            continue
        dband, aband = _phash_twin(d.text)
        r = got[d.doc_id]
        assert [r.d0, r.d1, r.d2, r.d3] == dband, d.doc_id
        assert [r.a0, r.a1, r.a2, r.a3] == aband, d.doc_id
        checked += 1
    assert checked == len(got)


def test_media_near_dup_pair_semantics(spark, sf_dir):
    """Brute-force twin of the banded join + Hamming verify over the
    twin hashes: candidates = any shared NONZERO dHash band; emitted =
    candidates with 64-bit dHash Hamming <= 10."""
    docs = load_sdf(spark, sf_dir, "documents").collect()
    hashes = {
        d.doc_id: _phash_twin(d.text) for d in docs if len(d.text) > 0
    }
    ids = sorted(hashes)
    want = {}
    for i, a in enumerate(ids):
        da, aa = hashes[a]
        for b in ids[i + 1:]:
            db, ab = hashes[b]
            if not any(x == y and x != 0 for x, y in zip(da, db)):
                continue
            hd = sum(bin(x ^ y).count("1") for x, y in zip(da, db))
            if hd <= 10:
                ha = sum(bin(x ^ y).count("1") for x, y in zip(aa, ab))
                want[(a, b)] = (hd, ha)
    got = {
        (r.id_a, r.id_b): (r.hamming_dhash, r.hamming_ahash)
        for r in REG["media_near_dup"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0  # the corpus' near-dups must actually surface


def test_media_near_dup_finds_suffix_edit_neardups(spark, sf_dir):
    """The corpus' known near-dup structure (suffix edits) must land at
    SMALL Hamming distances — the zero-padding contract (a cyclic wrap
    re-phases every pixel past the shorter length and loses them)."""
    import re

    docs = load_sdf(spark, sf_dir, "documents").collect()
    norm = {d.doc_id: re.sub(r"\s+", " ", d.text.lower()).strip() for d in docs}
    # exact-prefix near-dup pairs (one text = other + small suffix)
    prefix_pairs = {
        (a, b)
        for a in norm for b in norm
        if a < b and norm[a][:60] == norm[b][:60] and len(norm[a]) >= 60
    }
    got = {
        (r.id_a, r.id_b): r.hamming_dhash
        for r in REG["media_near_dup"].fn(spark, sf_dir).collect()
    }
    found = prefix_pairs & set(got)
    assert len(found) >= len(prefix_pairs) * 3 // 4, (
        len(found), len(prefix_pairs))
    for p in found:
        assert got[p] <= 10


# --------------------------------------------------------------------
# audio_fp_near_dup: delta-sign audio fingerprint dedup
# --------------------------------------------------------------------

def _afp_twin(text: str, window: int = 10, band: int = 16):
    """Independent fingerprint twin from the text (never touches WAV):
    window energies -> delta-sign bits -> full bands."""
    samples = [ord(ch) - 64 for ch in text]
    nw = len(samples) // window
    en = [
        sum(s * s for s in samples[k * window:(k + 1) * window])
        for k in range(nw)
    ]
    bands = {}
    for k in range(nw - 1):
        b, pos = k // band, k % band
        bands.setdefault(b, [0, 0])
        bands[b][1] += 1
        if en[k + 1] > en[k]:
            bands[b][0] |= 1 << pos
    return {b: v for b, (v, cnt) in bands.items() if cnt == band}


def test_audio_fp_near_dup_matches_text_twin(spark, sf_dir):
    """Brute-force twin of the whole query: candidates = shared exact
    nonzero band, emitted = common-band Hamming <= n_common_bands.
    Agreement proves the WAV encode -> container -> decode -> energy ->
    fingerprint chain bit-exact."""
    docs = load_sdf(spark, sf_dir, "documents").collect()
    fps = {d.doc_id: _afp_twin(d.text) for d in docs}
    ids = sorted(i for i in fps if fps[i])
    want = {}
    for i, a in enumerate(ids):
        fa = fps[a]
        for b in ids[i + 1:]:
            fb = fps[b]
            common = set(fa) & set(fb)
            if not any(fa[c] == fb[c] and fa[c] != 0 for c in common):
                continue
            ham = sum(bin(fa[c] ^ fb[c]).count("1") for c in common)
            if ham <= len(common):
                want[(a, b)] = (len(common), ham)
    got = {
        (r.id_a, r.id_b): (r.n_common_bands, r.hamming)
        for r in REG["audio_fp_near_dup"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0
    # the corpus' suffix-edit near-dups land at Hamming 0
    assert any(h == 0 for _, h in got.values())


# --------------------------------------------------------------------
# video_frame_dedup: keyframe-hash containment
# --------------------------------------------------------------------

def test_video_frame_dedup_matches_python_twin(spark, sf_dir):
    """Brute-force twin over the text: fixed-stride frame slices,
    df-capped inverted index, distinct-shared-hash containment."""
    docs = load_sdf(spark, sf_dir, "documents").collect()
    frames = {}
    for d in docs:
        t = d.text
        if len(t) == 0:
            continue
        frames[d.doc_id] = [t[k * 64:(k + 1) * 64]
                            for k in range((len(t) - 1) // 64 + 1)]
    dfreq = collections.Counter()
    for fs in frames.values():
        for fh in set(fs):
            dfreq[fh] += 1
    want = {}
    ids = sorted(frames)
    for i, a in enumerate(ids):
        sa = {f for f in frames[a] if dfreq[f] <= 20}
        for b in ids[i + 1:]:
            sb = {f for f in frames[b] if dfreq[f] <= 20}
            n = len(sa & sb)
            m = min(len(frames[a]), len(frames[b]))
            if n and 1000 * n >= 800 * m:
                want[(a, b)] = (n, (1000 * n) // m)
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.containment_permille)
        for r in REG["video_frame_dedup"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0
    for n, perm in got.values():
        assert 800 <= perm <= 1000


# --------------------------------------------------------------------
# dedup_incremental: crawl-vs-index band maintenance
# --------------------------------------------------------------------

def test_dedup_incremental_consistent_with_allpairs(spark, sf_dir):
    """The incremental chaining must agree with the engine's all-pairs
    verified near-dup set (identical banding/screen/threshold): a batch
    doc's partners are exactly its verified neighbors INSIDE the index
    as of its generation, and only novel docs enter the next
    generation's index. Catches wrong gen filters, a missing anti-join
    (dups leaking into the index), and partner-count drift."""
    out = {
        r.doc_id: r
        for r in REG["dedup_incremental"].fn(spark, sf_dir).collect()
    }
    adj = collections.defaultdict(set)
    for p in REG["minhash_near_dups"].fn(spark, sf_dir).collect():
        adj[p.id_a].add(p.id_b)
        adj[p.id_b].add(p.id_a)
    ids = sorted(
        d.doc_id
        for d in load_sdf(spark, sf_dir, "documents").select("doc_id").collect()
    )
    assert set(out) == {i for i in ids if i % 3 in (1, 2)}
    index = {i for i in ids if i % 3 == 0}
    for g in (1, 2):
        fresh = set()
        for i in (i for i in ids if i % 3 == g):
            partners = adj[i] & index
            r = out[i]
            assert r.gen == g
            assert r.n_dup_partners == len(partners), i
            assert r.is_novel == (0 if partners else 1), i
            if not partners:
                fresh.add(i)
        index |= fresh
    # the corpus' dup density must actually exercise both branches
    assert any(r.is_novel == 0 for r in out.values())
    assert any(r.is_novel == 1 for r in out.values())


def test_decode_bmp_pixels_topdown_orientation():
    """Negative-height BMPs store rows top-down: the decoder must not
    flip them (the positive-height flip is covered by the engine twin
    test above)."""
    import struct

    from df_spark.multimodal import _decode_bmp_pixels, _encode_bmp

    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    up = _encode_bmp(2, 2, rows)
    assert _decode_bmp_pixels(up) == (2, 2, rows)
    # rewrite the header height to -2 WITHOUT reordering the body:
    # stored row 0 now means logical row 0, so the decode flips
    down = bytearray(up)
    struct.pack_into("<i", down, 22, -2)
    w, h, got = _decode_bmp_pixels(bytes(down))
    assert (w, h) == (2, 2)
    assert got == [rows[1], rows[0]]


def test_corpus_is_ascii(spark, sf_dir):
    """The media/wav adapters encode UTF-8 BYTES while their oracles
    index the text by CHARACTER — identical only on a single-byte
    corpus. This pins that shared assumption (documented on
    ``documents_as_media``); if the driver corpus ever gains non-ASCII
    text, the oracles must move to byte indexing, and this fails first
    with a clear message instead of a value-hash mismatch."""
    from pyspark.sql import functions as F

    docs = load_sdf(spark, sf_dir, "documents")
    n_multibyte = docs.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert n_multibyte == 0, (
        f"{n_multibyte} documents contain multi-byte characters; the "
        "character-indexed media oracles no longer match the UTF-8 "
        "payload encode — switch the oracles to byte indexing"
    )
