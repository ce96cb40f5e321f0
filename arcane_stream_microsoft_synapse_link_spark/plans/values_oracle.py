"""Literal-VALUES DuckDB oracles for seeded-deterministic declared queries.

VERDICT r5 item 2b: several rows-only entries are pure functions of their
(fixed, seeded) inputs — synthetic media payloads, rolling fingerprints,
PCA fixed-point projections, BPE merge tables, SimHash pair sets — so the
driver CAN hash-verify them: this module computes each entry's expected
output with an INDEPENDENT reference implementation (pure Python / numpy /
pandas only — nothing below imports engine Spark code) and renders it as a
DuckDB ``VALUES`` relation.  The driver then compares the distributed
engine result against the sequential reference, exactly the check the
pytest reference-equality tests make, but executed independently by the
gate every round.

sf-dependence: the driver's gate always compares at sf0.01
(``/root/testdata/sf0.01``), so oracles whose reference reads corpus
tables are pinned there via ``ORACLE_SF`` and the local pytest/sweep
harnesses compare those entries at the pinned directory.  Media oracles
read no corpus table (the fixture is generated in-query) and hold at any
sf.

Everything here is deterministic: same inputs → same literals → the build
is a pure function, cached per process.  If the testdata directory is
missing (driver-less environments) the build degrades silently and the
affected entries simply stay rows-only.
"""

from __future__ import annotations

import hashlib
import os
import re

from .oracle import ORACLE, ORACLE_SF

_SF_PIN = "/root/testdata/sf0.01"

WORD_RE = re.compile(r"[a-z0-9]+")


# ---------------------------------------------------------------------------
# VALUES rendering
# ---------------------------------------------------------------------------


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def sql_values(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    """Render rows as ``SELECT CAST(...) ... FROM (VALUES ...)``.

    ``cols`` is ``[(name, ducktype), ...]``; every column is cast
    explicitly so the driver's type-sensitive hash sees BIGINT/VARCHAR/
    DOUBLE, never the width DuckDB infers for bare literals."""
    names = [f"c{i}" for i in range(len(cols))]
    sel = ", ".join(
        f"CAST({c} AS {typ}) AS {name}" for c, (name, typ) in zip(names, cols)
    )
    body = ",\n".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({', '.join(names)})"


# ---------------------------------------------------------------------------
# shared fixture inputs (re-derived from their specs, not imported)
# ---------------------------------------------------------------------------


def _media_items(n: int = 64):
    """The synthetic raw-media fixture spec (functions/multimodal.py
    raw_media_df): deterministic in (i, width, height).  Re-derived here so
    the reference shares only the DATA, not the engine code."""
    for i in range(n):
        w, h = 16 + (i % 4) * 4, 12 + (i % 3) * 4
        mt = ("image", "audio", "video")[i % 3]
        if mt == "image":
            payload = bytes(
                ((x * 255) // max(w - 1, 1) + y + i) % 256
                for y in range(h)
                for x in range(w)
            )
        elif mt == "video":
            n_frames = 2 + i % 3
            payload = bytes(
                (((x + y + f * 8 + i) % 2) * 255)
                for f in range(n_frames)
                for y in range(h)
                for x in range(w)
            )
        else:
            samples = 256 + (i % 7) * 64
            payload = b"".join(
                int((s * 257 + i * 13) % 4096 - 2048).to_bytes(2, "little", signed=True)
                for s in range(samples)
            )
        yield i, payload, mt, w, h


def _documents(sf_dir: str) -> list[tuple[int, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _doc_langs(sf_dir: str) -> dict[int, str]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("lang").to_pylist()))


# ---------------------------------------------------------------------------
# reference implementations (one per promoted entry)
# ---------------------------------------------------------------------------


def ref_media_features(bins: int = 8) -> list[tuple]:
    """(media_id, media_type, n_values, mean_milli, edge_milli, h0)."""
    import numpy as np

    rows = []
    for i, payload, mt, w, h in _media_items():
        if mt == "audio":
            flat = np.frombuffer(payload, dtype="<i2").astype(np.int64)
            lo, hi = -32768, 32768
            edge = int(np.abs(np.diff(flat)).sum()) * 1000 // max(flat.size - 1, 1)
        else:
            arr = np.frombuffer(payload, dtype=np.uint8)
            img2d = arr.reshape(-1, w).astype(np.int64)
            flat = img2d.ravel()
            lo, hi = 0, 256
            d = np.abs(np.diff(img2d, axis=1))
            edge = int(d.sum()) * 1000 // max(d.size, 1)
        h0 = int(np.histogram(flat, bins=bins, range=(lo, hi))[0][0])
        rows.append(
            (i, mt, int(flat.size), int(flat.sum()) * 1000 // flat.size, edge, h0)
        )
    return rows


def _bilinear_ref(src, out_w: int, out_h: int):
    """Independent bilinear resample (align_corners=False, pixel-center
    mapping, round-half-even) — scalar per-pixel arithmetic in the same
    top/bottom-then-vertical expression order as the spec, so float64
    results are bit-identical."""
    h = len(src)
    w = len(src[0])
    out = []
    for oy in range(out_h):
        y = (oy + 0.5) * (h / out_h) - 0.5
        y0 = min(max(int(y // 1), 0), h - 1)
        y1 = min(y0 + 1, h - 1)
        fy = min(max(y - y0, 0.0), 1.0)
        row = []
        for ox in range(out_w):
            x = (ox + 0.5) * (w / out_w) - 0.5
            x0 = min(max(int(x // 1), 0), w - 1)
            x1 = min(x0 + 1, w - 1)
            fx = min(max(x - x0, 0.0), 1.0)
            top = src[y0][x0] * (1 - fx) + src[y0][x1] * fx
            bot = src[y1][x0] * (1 - fx) + src[y1][x1] * fx
            v = top * (1 - fy) + bot * fy
            row.append(min(max(int(round(v)), 0), 255))
        out.append(row)
    return out


def ref_media_resize(out_w: int = 32, out_h: int = 32) -> list[tuple]:
    """(media_id, width, height, n_bytes, byte_sum, px_first, px_last)."""
    rows = []
    for i, payload, mt, w, h in _media_items():
        if mt != "image":
            continue
        src = [[float(payload[y * w + x]) for x in range(w)] for y in range(h)]
        img = _bilinear_ref(src, out_w, out_h)
        flat = [v for r in img for v in r]
        rows.append((i, out_w, out_h, len(flat), sum(flat), flat[0], flat[-1]))
    return rows


def ref_media_frames(every_ms: int = 500, frame_ms: int = 500) -> list[tuple]:
    """(media_id, frame_idx, frame_ts_ms, n_bytes, byte_sum)."""
    rows = []
    stride = max(every_ms // frame_ms, 1)
    for i, payload, mt, w, h in _media_items():
        if mt != "video":
            continue
        frame = w * h
        n_frames = len(payload) // frame
        for k in range(0, n_frames, stride):
            fb = payload[k * frame : (k + 1) * frame]
            rows.append((i, k, k * frame_ms, frame, sum(fb)))
    return rows


def ref_fingerprint_rolling(sf_dir: str, window: int = 4) -> list[tuple]:
    """(doc_id, fp64) — sequential blake2b rolling word-gram fold."""
    rows = []
    for doc_id, text in _documents(sf_dir):
        words = WORD_RE.findall((text or "").lower())
        n = len(words)
        grams = (
            [" ".join(words[i : i + window]) for i in range(n - window + 1)]
            if n >= window
            else [" ".join(words)]
        )
        acc = b"\x00" * 8
        for g in grams:
            acc = hashlib.blake2b(acc + g.encode(), digest_size=8).digest()
        rows.append((doc_id, int.from_bytes(acc, "big", signed=False) - (1 << 63)))
    return rows


def ref_embedding_pca(sf_dir: str, n_components: int = 4) -> list[tuple]:
    """(vec_id, pc1_fp, pc2_fp) — single-node moment-form PCA with the
    spec's deterministic sign fix and ×1000 fixed-point floor."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = len(X)
    S = X.sum(axis=0)
    O = X.T @ X
    mean = S / n
    cov = O / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    proj = (X - mean) @ comps.T
    rows = []
    for vid, p in zip(ids, proj):
        rows.append(
            (
                vid,
                int(np.floor(p[0] * 1000 + 0.5)),
                int(np.floor(p[1] * 1000 + 0.5)),
            )
        )
    return rows


def ref_bpe_train(sf_dir: str, n_merges: int = 10) -> list[tuple]:
    """(merge_rank, left_sym, right_sym, merged, pair_count) — sequential
    BPE: [a-z]+ words ≥2 chars, count-desc / lexicographic tie-break,
    greedy left-to-right merge."""
    from collections import Counter

    wc = Counter(
        w
        for _, t in _documents(sf_dir)
        for w in re.findall("[a-z]+", (t or "").lower())
    )
    vocab = {tuple(w): c for w, c in wc.items() if len(w) >= 2}
    out = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, l, r, l + r, cnt))
        nxt: dict[tuple, int] = {}
        for sym, c in vocab.items():
            merged, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            key = tuple(merged)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return out


def ref_simhash_near_dup(sf_dir: str, max_hamming: int = 8, band_bits: int = 16) -> list[tuple]:
    """(id_a, id_b, hamming) — sequential SimHash (pandas SipHash word
    hash, bit votes), banded candidate generation, exact Hamming verify."""
    import numpy as np
    import pandas as pd

    sigs: list[tuple[int, int]] = []
    for doc_id, text in _documents(sf_dir):
        words = WORD_RE.findall((text or "").lower())
        if not words:
            sigs.append((doc_id, 0))
            continue
        H = pd.util.hash_array(np.asarray(words, dtype=object))
        bits = np.unpackbits(H.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(words)
        packed = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
        sigs.append((doc_id, int(packed.view(np.int64)[0])))

    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for idx, (_, sim) in enumerate(sigs):
        for b in range(nbands):
            buckets.setdefault((b, (sim >> (b * band_bits)) & mask), []).append(idx)
    pairs = set()
    for members in buckets.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                x, y = members[ai], members[bi]
                ida, idb = sigs[x][0], sigs[y][0]
                if ida > idb:
                    ida, idb = idb, ida
                elif ida == idb:
                    continue
                pairs.add((ida, idb, sigs[x][1], sigs[y][1]))
    rows = []
    for ida, idb, sa, sb in pairs:
        ham = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
        if ham <= max_hamming:
            rows.append((ida, idb, ham))
    return sorted(rows)


def _phash_bits_pack(bits) -> int:
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= 1 << 63 else val


def ref_image_near_dup(
    n: int = 64, n_variants: int = 8, noise: int = 2, max_hamming: int = 6
) -> list[tuple]:
    """(id_a, id_b, hamming) — sequential dHash near-dup over the planted
    fixture: re-derive base + variant bitmaps, independent bilinear 9×8
    downscale, gradient-sign bits, 8-bit-band candidate generation (the
    same pigeonhole the engine uses), exact Hamming verify."""
    items: list[tuple[int, bytes, int, int]] = []
    made = 0
    for i, payload, mt, w, h in _media_items(n):
        if mt != "image":
            continue
        items.append((i, payload, w, h))
        if made < n_variants:
            made += 1
            vp = bytes(
                min(
                    max(
                        ((x * 255) // max(w - 1, 1) + y + i) % 256
                        + ((x * 7 + y * 13 + i) % (2 * noise + 1) - noise),
                        0,
                    ),
                    255,
                )
                for y in range(h)
                for x in range(w)
            )
            items.append((i + 1000, vp, w, h))

    hashes: list[tuple[int, int]] = []
    for mid, payload, w, h in items:
        src = [[float(payload[y * w + x]) for x in range(w)] for y in range(h)]
        g9 = _bilinear_ref(src, 9, 8)
        bits = [
            1 if g9[y][x + 1] > g9[y][x] else 0 for y in range(8) for x in range(8)
        ]
        hashes.append((mid, _phash_bits_pack(bits)))

    rows = []
    for ai in range(len(hashes)):
        for bi in range(ai + 1, len(hashes)):
            ida, ha = hashes[ai]
            idb, hb = hashes[bi]
            if ida > idb:
                ida, idb, ha, hb = idb, ida, hb, ha
            shares_band = any(
                ((ha >> (b * 8)) & 0xFF) == ((hb >> (b * 8)) & 0xFF)
                for b in range(8)
            )
            if not shares_band:
                continue
            ham = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                rows.append((ida, idb, ham))
    return sorted(rows)


def ref_bpe_encode(sf_dir: str, n_merges: int = 10) -> list[tuple]:
    """(doc_id, n_words, n_tokens, n_chars_encoded) — sequential BPE
    encode with merges from ``ref_bpe_train``: best-pair-first (lowest
    rank present wins), greedy left-to-right within a rank.  Docs with no
    [a-z]+ word are omitted (mirrors the engine's explode)."""
    merges = ref_bpe_train(sf_dir, n_merges)
    rank_of = {(l, r): rank for rank, l, r, _, _ in merges}
    rows = []
    for doc_id, text in _documents(sf_dir):
        words = re.findall("[a-z]+", (text or "").lower())
        if not words:
            continue
        n_tokens = 0
        for w in words:
            sym = list(w)
            while len(sym) >= 2:
                best = None
                for i in range(len(sym) - 1):
                    rk = rank_of.get((sym[i], sym[i + 1]))
                    if rk is not None and (best is None or rk < best):
                        best, left, right = rk, sym[i], sym[i + 1]
                if best is None:
                    break
                out, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            n_tokens += len(sym)
        rows.append((doc_id, len(words), n_tokens, sum(len(w) for w in words)))
    return rows


def _minhash_verified_pairs(
    docs: list[tuple[int, str]],
    threshold_num: int,
    threshold_den: int,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket: int = 64,
) -> list[tuple]:
    """Sequential MinHash LSH + exact Jaccard over an id→text list: per
    doc the distinct word-3-gram set, the seeded affine SipHash signature
    family, banded (32×4) candidate buckets with the engine's
    first-``max_bucket``-sorted-ids cap, then exact shingle-set
    intersection/union on candidates with the threshold as the exact
    rational ``inter/union ≥ num/den`` (``den·inter ≥ num·union``)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    A = rng.randint(1, 2**63 - 1, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    B = rng.randint(0, 2**63 - 1, size=num_hashes, dtype=np.uint64)

    sigs: dict[int, "np.ndarray"] = {}
    shingle_sets: dict[int, frozenset] = {}
    for doc_id, text in docs:
        words = WORD_RE.findall((text or "").lower())
        if len(words) <= shingle_k:
            grams = [" ".join(words)]
        else:
            grams = sorted(
                {" ".join(words[i : i + shingle_k]) for i in range(len(words) - shingle_k + 1)}
            )
        shingle_sets[doc_id] = frozenset(grams)
        H = pd.util.hash_array(np.asarray(grams, dtype=object))
        sigs[doc_id] = (H[:, None] * A[None, :] + B[None, :]).min(axis=0).view(np.int64)

    buckets: dict[tuple, list[int]] = {}
    r = num_hashes // bands
    for doc_id in sorted(sigs):
        s = sigs[doc_id]
        for b in range(bands):
            buckets.setdefault((b, tuple(s[b * r : (b + 1) * r].tolist())), []).append(doc_id)

    cand = set()
    for members in buckets.values():
        capped = members[:max_bucket]  # ids arrive sorted → the engine's cap
        for ai in range(len(capped)):
            for bi in range(ai + 1, len(capped)):
                cand.add((capped[ai], capped[bi]))

    rows = []
    for ida, idb in cand:
        sa, sb = shingle_sets[ida], shingle_sets[idb]
        inter = len(sa & sb)
        union = max(len(sa | sb), 1)
        if threshold_den * inter >= threshold_num * union:
            rows.append((ida, idb, inter, union))
    return sorted(rows)


def ref_minhash_near_dup(sf_dir: str) -> list[tuple]:
    """(id_a, id_b, n_inter, n_union) at threshold 1/2 over the corpus."""
    return _minhash_verified_pairs(_documents(sf_dir), 1, 2)


def ref_dedup_pipeline(sf_dir: str) -> list[tuple]:
    """(doc_id,) — the end-to-end dedup keepers: exact dedup (min id per
    text group), MinHash near-dup pairs at threshold 1/2 over the
    survivors, connected components by union-find, keep only each
    component's min id plus all unpaired docs."""
    by_text: dict[str, int] = {}
    docs = _documents(sf_dir)
    for doc_id, text in sorted(docs):
        key = text or ""
        if key not in by_text or doc_id < by_text[key]:
            by_text[key] = doc_id
    keepers = set(by_text.values())
    kept_docs = [(d, t) for d, t in docs if d in keepers]
    pairs = _minhash_verified_pairs(kept_docs, 1, 2)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ida, idb, _, _ in pairs:
        ra, rb = find(ida), find(idb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    losers = {x for x in parent if find(x) != x}
    return sorted((d,) for d in keepers - losers)


def ref_embedding_near_dup(
    sf_dir: str,
    threshold: float = 0.4,
    max_hamming: int = 28,
    band_bits: int = 8,
    n_bits: int = 64,
    seed: int = 42,
) -> list[tuple]:
    """(id_a, id_b, cos_ppm) — sequential sign-LSH near-dup: seeded
    random-hyperplane signatures over the float64 matrix (the engine's
    single-batch matmul shape), banded candidates, exact cosine as the
    JVM's strict left-to-right fold (per-element float64 products), ×1e6
    fixed-point floor."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    planes = np.random.RandomState(seed).randn(X.shape[1], n_bits)
    bits = (X @ planes) > 0
    sig = {}
    for row_i, vid in enumerate(ids):
        val = 0
        for j in range(n_bits):
            if bits[row_i, j]:
                val |= 1 << j
        sig[vid] = val - (1 << 63)

    def fold_dot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    vecs = {vid: [float(v) for v in X[i]] for i, vid in enumerate(ids)}
    nbands = n_bits // band_bits
    mask = (1 << band_bits) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for vid in ids:
        for b in range(nbands):
            buckets.setdefault((b, (sig[vid] >> (b * band_bits)) & mask), []).append(vid)
    cand = set()
    for members in buckets.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                ida, idb = members[ai], members[bi]
                if ida == idb:
                    continue
                if ida > idb:
                    ida, idb = idb, ida
                cand.add((ida, idb))
    rows = []
    for ida, idb in cand:
        ham = bin((sig[ida] ^ sig[idb]) & ((1 << 64) - 1)).count("1")
        if ham > max_hamming:
            continue
        va, vb = vecs[ida], vecs[idb]
        cos = fold_dot(va, vb) / (
            math.sqrt(fold_dot(va, va)) * math.sqrt(fold_dot(vb, vb))
        )
        if cos >= threshold:
            rows.append((ida, idb, math.floor(cos * 1e6)))
    return sorted(rows)


def ref_bpe_pack(sf_dir: str, budget: int = 4096, n_merges: int = 10) -> list[tuple]:
    """(lang, seq_id, n_docs, seq_tokens) — concat-and-chop packing over
    REFERENCE BPE token counts: per lang in doc_id order, a doc's window
    is floor(tokens-before-it / budget)."""
    enc = {d: tk for d, _, tk, _ in ref_bpe_encode(sf_dir, n_merges)}
    langs = _doc_langs(sf_dir)
    per_lang: dict[str, list[tuple[int, int]]] = {}
    for doc_id, n_tok in enc.items():
        per_lang.setdefault(langs[doc_id], []).append((doc_id, n_tok))
    agg: dict[tuple[str, int], list[int]] = {}
    for lang, docs in per_lang.items():
        run = 0
        for doc_id, n_tok in sorted(docs):
            seq_id = run // budget
            run += n_tok
            cell = agg.setdefault((lang, seq_id), [0, 0])
            cell[0] += 1
            cell[1] += n_tok
    return sorted((lang, sid, c[0], c[1]) for (lang, sid), c in agg.items())


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def build() -> dict[str, str]:
    """Compute every literal oracle (pure-function references).  Corpus-
    reading references are pinned to the driver's compare scale."""
    oracles: dict[str, str] = {}
    oracles["ops_media_features"] = sql_values(
        ref_media_features(),
        [
            ("media_id", "BIGINT"),
            ("media_type", "VARCHAR"),
            ("n_values", "BIGINT"),
            ("mean_milli", "BIGINT"),
            ("edge_milli", "BIGINT"),
            ("h0", "BIGINT"),
        ],
    )
    oracles["ops_media_resize"] = sql_values(
        ref_media_resize(),
        [
            ("media_id", "BIGINT"),
            ("width", "INTEGER"),
            ("height", "INTEGER"),
            ("n_bytes", "BIGINT"),
            ("byte_sum", "BIGINT"),
            ("px_first", "BIGINT"),
            ("px_last", "BIGINT"),
        ],
    )
    oracles["ops_image_near_dup"] = sql_values(
        ref_image_near_dup(),
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "BIGINT")],
    )
    oracles["ops_media_frames"] = sql_values(
        ref_media_frames(),
        [
            ("media_id", "BIGINT"),
            ("frame_idx", "BIGINT"),
            ("frame_ts_ms", "BIGINT"),
            ("n_bytes", "BIGINT"),
            ("byte_sum", "BIGINT"),
        ],
    )
    if os.path.isdir(_SF_PIN):
        pinned = {
            "ops_fingerprint_rolling": sql_values(
                ref_fingerprint_rolling(_SF_PIN),
                [("doc_id", "BIGINT"), ("fp64", "BIGINT")],
            ),
            "ops_embedding_pca": sql_values(
                ref_embedding_pca(_SF_PIN),
                [("vec_id", "BIGINT"), ("pc1_fp", "BIGINT"), ("pc2_fp", "BIGINT")],
            ),
            "ops_bpe_train": sql_values(
                ref_bpe_train(_SF_PIN),
                [
                    ("merge_rank", "BIGINT"),
                    ("left_sym", "VARCHAR"),
                    ("right_sym", "VARCHAR"),
                    ("merged", "VARCHAR"),
                    ("pair_count", "BIGINT"),
                ],
            ),
            "ops_simhash_near_dup": sql_values(
                ref_simhash_near_dup(_SF_PIN),
                [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "BIGINT")],
            ),
            "ops_dedup_pipeline": sql_values(
                ref_dedup_pipeline(_SF_PIN),
                [("doc_id", "BIGINT")],
            ),
            "ops_embedding_near_dup": sql_values(
                ref_embedding_near_dup(_SF_PIN),
                [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("cos_ppm", "BIGINT")],
            ),
            "ops_minhash_near_dup": sql_values(
                ref_minhash_near_dup(_SF_PIN),
                [
                    ("id_a", "BIGINT"),
                    ("id_b", "BIGINT"),
                    ("n_inter", "BIGINT"),
                    ("n_union", "BIGINT"),
                ],
            ),
            "ops_bpe_pack": sql_values(
                ref_bpe_pack(_SF_PIN),
                [
                    ("lang", "VARCHAR"),
                    ("seq_id", "BIGINT"),
                    ("n_docs", "BIGINT"),
                    ("seq_tokens", "BIGINT"),
                ],
            ),
            "ops_bpe_encode": sql_values(
                ref_bpe_encode(_SF_PIN),
                [
                    ("doc_id", "BIGINT"),
                    ("n_words", "BIGINT"),
                    ("n_tokens", "BIGINT"),
                    ("n_chars_encoded", "BIGINT"),
                ],
            ),
        }
        oracles.update(pinned)
        for name in pinned:
            ORACLE_SF[name] = _SF_PIN
    return oracles


def register() -> None:
    try:
        oracles = build()
    except Exception:  # missing testdata / numpy quirk → entries stay rows-only
        return
    ORACLE.update(oracles)


register()
