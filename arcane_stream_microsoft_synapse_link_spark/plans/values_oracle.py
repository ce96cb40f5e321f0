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


def ref_bloom_decontaminate(
    sf_dir: str, n: int = 8, m_bits: int = 1 << 20, k: int = 4
) -> list[tuple]:
    """Sequential mirror of functions/dedup.bloom_decontaminate_stats:
    same word n-grams, same Spark-bit-equal xxh64 (seed 42, UTF-8), same
    Kirsch–Mitzenmacher probe positions, a Python set as the bitmap —
    bit-identical including the filter's (deterministic) false positives."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("source").to_pylist(),
        )
    )

    def grams(text: str) -> list[str]:
        ws = WORD_RE.findall((text or "").lower())
        if len(ws) < n:
            return []
        return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]

    def positions(g: str) -> list[int]:
        u = xxh64(g.encode("utf-8"))
        lo = u & 0xFFFFFFFF
        step = (u >> 32) | 1
        return [(lo + i * step) % m_bits for i in range(k)]

    bits: set[int] = set()
    for _, tx, src in rows:
        if src == "src0":
            for g in set(grams(tx)):
                bits.update(positions(g))
    out = []
    for d, tx, src in sorted(rows):
        if src == "src0":
            continue
        gs = grams(tx)
        if not gs:
            continue
        hits = sum(1 for g in gs if all(p in bits for p in positions(g)))
        out.append((d, len(gs), hits, 1 if hits > 0 else 0))
    return out


def ref_compression_filter(
    sf_dir: str, level: int = 6, low_ppm: int = 450_000, high_ppm: int = 800_000
) -> list[tuple]:
    """Sequential mirror of functions/text.compression_stats: same DEFLATE
    level on the same UTF-8 bytes, integer-ppm ratio, same verdict band."""
    import zlib

    out = []
    for d, tx in sorted(_documents(sf_dir)):
        b = (tx or "").encode("utf-8")
        z = len(zlib.compress(b, level))
        r = z * 1_000_000 // max(len(b), 1)
        v = "repetitive" if r < low_ppm else ("incompressible" if r > high_ppm else "keep")
        out.append((d, len(b), z, r, v))
    return out


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


_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s+ (ASCII), not Python's unicode \s


def _ws_words(text: str | None) -> list[str]:
    return [w for w in _WS_RE.split(text or "") if w]


def ref_bpe_bytes_train(sf_dir: str, n_merges: int = 10) -> list[tuple]:
    """(merge_rank, left_sym, right_sym, merged, pair_count) — sequential
    BYTE-level BPE: whitespace-split case-preserving words, UTF-8 bytes
    as lowercase hex-pair symbols, count-desc / lexicographic tie-break,
    greedy left-to-right merge.  Independent of engine code."""
    from collections import Counter

    wc = Counter(w for _, t in _documents(sf_dir) for w in _ws_words(t))
    vocab = {
        tuple(f"{b:02x}" for b in w.encode("utf-8")): c
        for w, c in wc.items()
        if len(w.encode("utf-8")) >= 2
    }
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


def ref_bpe_bytes_encode(sf_dir: str, n_merges: int = 10) -> list[tuple]:
    """(doc_id, n_words, n_tokens, n_bytes) — sequential byte-level BPE
    encode with merges from ``ref_bpe_bytes_train``: best-pair-first.
    Docs with no non-whitespace content are omitted (mirrors the
    engine's explode)."""
    merges = ref_bpe_bytes_train(sf_dir, n_merges)
    rank_of = {(l, r): rank for rank, l, r, _, _ in merges}
    rows = []
    for doc_id, text in _documents(sf_dir):
        words = _ws_words(text)
        if not words:
            continue
        n_tokens, n_bytes = 0, 0
        for w in words:
            sym = [f"{b:02x}" for b in w.encode("utf-8")]
            n_bytes += len(sym)
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
        rows.append((doc_id, len(words), n_tokens, n_bytes))
    return sorted(rows)


def ref_token_packing_bfd(sf_dir: str, budget: int = 4096) -> list[tuple]:
    """(lang, seq_id, n_docs, seq_tokens, fill_ppm) — sequential
    best-fit-decreasing packing mirror: per lang, docs sorted by
    whitespace-token count DESC (doc_id ASC tie-break), each placed in
    the fullest bin that still fits (ties → lowest bin id), else a new
    bin; oversized docs capped at budget alone."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    # ASCII \S+ (mirrors _WS_RE): the engine's token_count uses Java regex
    # \S — ASCII [ \t\n\x0b\f\r] complement — while Python \S is Unicode, so
    # NBSP / \x1c-\x1f / ideographic space would diverge under Python \S+.
    ws = re.compile(r"[^ \t\n\x0b\f\r]+")
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for d, lang, text in zip(
        t.column("doc_id").to_pylist(),
        t.column("lang").to_pylist(),
        t.column("text").to_pylist(),
    ):
        by_lang.setdefault(lang, []).append((len(ws.findall(text or "")), d))
    rows = []
    for lang in sorted(by_lang):
        docs = sorted(by_lang[lang], key=lambda p: (-p[0], p[1]))
        loads: list[int] = []
        ndocs: list[int] = []
        for tok, _ in docs:
            eff = min(tok, budget)
            best, best_load = -1, -1
            for i, ld in enumerate(loads):
                if ld + eff <= budget and ld > best_load:
                    best, best_load = i, ld
            if best < 0:
                loads.append(eff)
                ndocs.append(1)
            else:
                loads[best] += eff
                ndocs[best] += 1
        for i, (ld, nd) in enumerate(zip(loads, ndocs)):
            rows.append((lang, i, nd, ld, ld * 1_000_000 // budget))
    return rows


def _ref_wp_merge(left: str, right: str) -> str:
    return left + (right[2:] if right.startswith("##") else right)


def ref_wordpiece_train(sf_dir: str, n_merges: int = 10) -> list[tuple]:
    """(rank, left, right, merged, pair_count, left_count, right_count) —
    sequential WordPiece: likelihood score count(pair)/(count(l)count(r))
    compared as exact cross-multiplied integers, tie-break (left, right)
    ASC; greedy left-to-right merge.  Independent of engine code."""
    from collections import Counter

    wc = Counter(
        w
        for _, t in _documents(sf_dir)
        for w in re.findall("[a-z]+", (t or "").lower())
    )
    vocab: dict[tuple, int] = {}
    for w, c in wc.items():
        if len(w) < 2:
            continue
        key = tuple([w[0], *(f"##{ch}" for ch in w[1:])])
        vocab[key] = vocab.get(key, 0) + c
    out = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for sym, c in vocab.items():
            for s in sym:
                sc[s] += c
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        best = None
        for (l, r), c in pc.items():
            if best is None:
                best = (c, sc[l], sc[r], l, r)
                continue
            lhs = c * best[1] * best[2]
            rhs = best[0] * sc[l] * sc[r]
            if lhs > rhs or (lhs == rhs and (l, r) < (best[3], best[4])):
                best = (c, sc[l], sc[r], l, r)
        c, la, rb, l, r = best
        out.append((rank, l, r, _ref_wp_merge(l, r), c, la, rb))
        nxt: dict[tuple, int] = {}
        for sym, cnt in vocab.items():
            merged, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    merged.append(_ref_wp_merge(l, r))
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            key = tuple(merged)
            nxt[key] = nxt.get(key, 0) + cnt
        vocab = nxt
    return out


def _langid_corpus(sf_dir: str) -> list[tuple[int, str, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    return list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )


def _langid_buckets(text: str, n_buckets: int):
    """Hashed byte 2-/3-gram buckets — the deterministic feature space of
    functions/langid.py, re-stated here so the mirror shares no engine
    code (numpy shift-or over utf-8 bytes, Knuth multiplicative hash)."""
    import numpy as np

    raw = (" " + (text or "").lower() + " ").encode("utf-8")
    b = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    g2 = (b[:-1] << np.uint64(8)) | b[1:]
    g3 = (b[:-2] << np.uint64(16)) | (b[1:-1] << np.uint64(8)) | b[2:]
    grams = np.concatenate([g2, g3])
    return (
        (grams * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    ) % np.uint64(n_buckets)


def _langid_model(sf_dir: str, n_buckets: int):
    """(sorted labels, int64 count matrix [L×B], doc counts) from one
    sequential pass."""
    import numpy as np

    corpus = _langid_corpus(sf_dir)
    labels = sorted({lang for _, _, lang in corpus})
    ix = {lang: i for i, lang in enumerate(labels)}
    cnt = np.zeros((len(labels), n_buckets), dtype=np.int64)
    n_docs = np.zeros(len(labels), dtype=np.int64)
    for _, text, lang in corpus:
        buckets = _langid_buckets(text, n_buckets)
        cnt[ix[lang]] += np.bincount(buckets.astype(np.int64), minlength=n_buckets)
        n_docs[ix[lang]] += 1
    return labels, cnt, n_docs


def ref_langid_train(sf_dir: str, n_buckets: int = 4096) -> list[tuple]:
    """(lang, n_docs, n_grams, buckets_hit, model_md5) — sequential mirror
    of the hashed-ngram NB sufficient statistics (engine:
    functions/langid.py:langid_train + langid_model_summary); model_md5
    digests the canonical 'bucket:cnt' comma-join in bucket order, so 5
    summary rows pin every count in the L×B model."""
    labels, cnt, n_docs = _langid_model(sf_dir, n_buckets)
    rows = []
    for i, lang in enumerate(labels):
        nz = cnt[i].nonzero()[0]
        canon = ",".join(f"{int(b)}:{int(cnt[i][b])}" for b in nz)
        rows.append(
            (
                lang,
                int(n_docs[i]),
                int(cnt[i].sum()),
                int(len(nz)),
                hashlib.md5(canon.encode()).hexdigest(),
            )
        )
    return rows


def ref_langid(sf_dir: str, n_buckets: int = 4096) -> list[tuple]:
    """(doc_id, lang_pred, margin_ppm) — sequential mirror of the NB
    train+sweep (engine: functions/langid.py:langid_fit_predict): Laplace
    log-probs and priors in float64, per-doc score via the same
    fixed-order pairwise reduction (logp*hist).sum(axis=1), argmax ties
    to the first (lexicographically smallest) label, margin floored to
    micro-nats."""
    import math

    import numpy as np

    labels, cnt, n_docs = _langid_model(sf_dir, n_buckets)
    cntf = cnt.astype(np.float64)
    totals = cntf.sum(axis=1)
    logp = np.log((cntf + 1.0) / (totals + float(n_buckets))[:, None])
    ndf = n_docs.astype(np.float64)
    logprior = np.log(ndf / ndf.sum())
    rows = []
    for doc_id, text, _ in _langid_corpus(sf_dir):
        buckets = _langid_buckets(text, n_buckets)
        hist = np.bincount(buckets.astype(np.int64), minlength=n_buckets).astype(
            np.float64
        )
        scores = (logp * hist).sum(axis=1) + logprior
        best = int(np.argmax(scores))
        if len(labels) < 2:
            margin = 0
        else:
            runner = np.max(np.delete(scores, best))
            margin = int(math.floor((float(scores[best]) - float(runner)) * 1e6))
        rows.append((doc_id, labels[best], margin))
    rows.sort()
    return rows


def ref_curation_funnel_langid(
    sf_dir: str, margin_floor: int = 12_000_000, target: str = "en"
) -> list[tuple]:
    """(stage_rank, stage, n_in, n_rejected, n_out) — sequential mirror of
    the langid-first curation funnel (engine:
    plans/extensions.py:ops_curation_funnel_langid): langid rejection
    from the same NB mirror ref_langid verifies, then quality / exact-dup
    / contamination flags re-derived sequentially, each doc charged to
    its FIRST rejecting stage."""
    import pyarrow.parquet as pq

    preds = {d: (lang, margin) for d, lang, margin in ref_langid(sf_dir)}
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("source").to_pylist(),
        )
    )
    corpus = [(d, tx or "") for d, tx, src in rows if src != "src0"]
    bench_grams: set[str] = set()
    for _, tx, src in rows:
        if src == "src0":
            ws = WORD_RE.findall((tx or "").lower())
            for i in range(len(ws) - 7):
                bench_grams.add(" ".join(ws[i : i + 8]))
    keeper: dict[str, int] = {}
    for d, tx in corpus:
        h = hashlib.md5(tx.encode("utf-8")).hexdigest()
        keeper[h] = min(keeper.get(h, d), d)
    n = len(corpus)
    nl = nq = nd = nc = 0
    for d, tx in corpus:
        lang, margin = preds[d]
        if lang != target or margin < margin_floor:
            nl += 1
            continue
        ws = WORD_RE.findall(tx.lower())
        if len(ws) < 40 or (len(set(ws)) / len(ws)) < 0.2:
            nq += 1
            continue
        if d != keeper[hashlib.md5(tx.encode("utf-8")).hexdigest()]:
            nd += 1
            continue
        if any(
            " ".join(ws[i : i + 8]) in bench_grams for i in range(len(ws) - 7)
        ):
            nc += 1
    return [
        (1, "langid", n, nl, n - nl),
        (2, "quality", n - nl, nq, n - nl - nq),
        (3, "exact_dup", n - nl - nq, nd, n - nl - nq - nd),
        (4, "contaminated", n - nl - nq - nd, nc, n - nl - nq - nd - nc),
    ]


_GOPHER_STOPS = {"the", "be", "to", "of", "and", "that", "have", "with"}


def _gopher_rules_failed(tx: str) -> int:
    """Sequential mirror of functions/text.py:gopher_rules — failed-rule
    count per doc (ASCII corpus: Python \\s == Java \\s here; the engine's
    Java-regex semantics are the contract, see the _WS_RE discipline)."""
    ws = re.findall("[a-z0-9]+", (tx or "").lower())
    lines = (tx or "").split("\n")
    n_sym = (tx or "").count("#") + len(re.findall(r"\.\.\.", tx or ""))
    nw = len(ws)
    fails = 0
    fails += not (50 <= nw <= 100000)
    if nw == 0:
        fails += 3  # mwl / symbol / alpha are NULL -> each rule fails
    else:
        mwl = sum(len(w) for w in ws) * 10**6 // nw
        fails += not (3_000_000 <= mwl <= 10_000_000)
        fails += not ((n_sym * 10**6 // nw) <= 100_000)
        alpha = sum(1 for w in ws if re.search("[a-z]", w)) * 10**6 // nw
        fails += not (alpha >= 800_000)
    bullet = (
        sum(1 for l in lines if re.search(r"^\s*([-*•]|[0-9]+\.)\s", l))
        * 10**6
        // len(lines)
    )
    fails += not (bullet <= 900_000)
    ell = (
        sum(1 for l in lines if re.search(r"\.\.\.\s*$", l)) * 10**6 // len(lines)
    )
    fails += not (ell <= 300_000)
    fails += not (len(set(ws) & _GOPHER_STOPS) >= 2)
    return fails


def ref_curation_funnel_gopher(
    sf_dir: str, margin_floor: int = 12_000_000, target: str = "en"
) -> list[tuple]:
    """(stage_rank, stage, n_in, n_rejected, n_out) — sequential mirror of
    the complete published ladder langid → gopher → quality → exact-dup →
    contamination (engine: plans/extensions.py:ops_curation_funnel_gopher;
    gopher stage rejects at n_rules_failed >= 2, the documented
    corpus-baseline threshold)."""
    import pyarrow.parquet as pq

    preds = {d: (lang, margin) for d, lang, margin in ref_langid(sf_dir)}
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("source").to_pylist(),
        )
    )
    corpus = [(d, tx or "") for d, tx, src in rows if src != "src0"]
    bench_grams: set[str] = set()
    for _, tx, src in rows:
        if src == "src0":
            ws = WORD_RE.findall((tx or "").lower())
            for i in range(len(ws) - 7):
                bench_grams.add(" ".join(ws[i : i + 8]))
    keeper: dict[str, int] = {}
    for d, tx in corpus:
        h = hashlib.md5(tx.encode("utf-8")).hexdigest()
        keeper[h] = min(keeper.get(h, d), d)
    n = len(corpus)
    nl = ng = nq = nd = nc = 0
    for d, tx in corpus:
        lang, margin = preds[d]
        if lang != target or margin < margin_floor:
            nl += 1
            continue
        if _gopher_rules_failed(tx) >= 2:
            ng += 1
            continue
        ws = WORD_RE.findall(tx.lower())
        if len(ws) < 40 or (len(set(ws)) / len(ws)) < 0.2:
            nq += 1
            continue
        if d != keeper[hashlib.md5(tx.encode("utf-8")).hexdigest()]:
            nd += 1
            continue
        if any(
            " ".join(ws[i : i + 8]) in bench_grams for i in range(len(ws) - 7)
        ):
            nc += 1
    return [
        (1, "langid", n, nl, n - nl),
        (2, "gopher", n - nl, ng, n - nl - ng),
        (3, "quality", n - nl - ng, nq, n - nl - ng - nq),
        (4, "exact_dup", n - nl - ng - nq, nd, n - nl - ng - nq - nd),
        (5, "contaminated", n - nl - ng - nq - nd, nc, n - nl - ng - nq - nd - nc),
    ]


def ref_wordpiece_encode(sf_dir: str, n_merges: int = 10) -> list[tuple]:
    """(doc_id, n_words, n_pieces, n_unk, pieces_md5) — sequential
    WordPiece encode: vocab = training chars (plain + ##) + merge
    outputs; greedy longest-match-first, whole word → [UNK] on a miss.
    pieces_md5 = md5 of the space-joined per-occurrence word-piece md5s
    sorted by word (the engine's order-free per-doc digest)."""
    merges = ref_wordpiece_train(sf_dir, n_merges)
    vocab: set[str] = set()
    for _, t in _documents(sf_dir):
        for w in re.findall("[a-z]+", (t or "").lower()):
            for ch in set(w):
                vocab.add(ch)
                vocab.add(f"##{ch}")
    for m in merges:
        vocab.add(m[3])

    def enc(word: str) -> list[str]:
        out, i, n = [], 0, len(word)
        while i < n:
            j = n
            piece = None
            while j > i:
                cand = word[i:j] if i == 0 else f"##{word[i:j]}"
                if cand in vocab:
                    piece = cand
                    break
                j -= 1
            if piece is None:
                return ["[UNK]"]
            out.append(piece)
            i = j
        return out

    memo: dict[str, tuple[int, int, str]] = {}
    rows = []
    for doc_id, text in _documents(sf_dir):
        words = re.findall("[a-z]+", (text or "").lower())
        if not words:
            continue
        n_pieces = n_unk = 0
        occ = []
        for w in words:
            got = memo.get(w)
            if got is None:
                pieces = enc(w)
                got = (
                    len(pieces),
                    1 if pieces == ["[UNK]"] else 0,
                    hashlib.md5(" ".join(pieces).encode()).hexdigest(),
                )
                memo[w] = got
            n_pieces += got[0]
            n_unk += got[1]
            occ.append((w, got[2]))
        occ.sort()
        digest = hashlib.md5(" ".join(md for _, md in occ).encode()).hexdigest()
        rows.append((doc_id, len(words), n_pieces, n_unk, digest))
    return sorted(rows)


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


def ref_audio_near_dup(
    n: int = 64, n_variants: int = 8, n_windows: int = 65, max_hamming: int = 6
) -> list[tuple]:
    """(id_a, id_b, hamming) — sequential energy-contour audio near-dup
    over the planted fixture: re-derive base + jittered PCM, exact-integer
    window energies, gradient-sign bits, 8-bit-band candidates, exact
    Hamming verify.  All-integer arithmetic — exact at any scale."""
    items: list[tuple[int, list[int]]] = []
    made = 0
    for i in range(n):
        if ("image", "audio", "video")[i % 3] != "audio":
            continue
        samples = 256 + (i % 7) * 64
        base = [((s * 257 + i * 13) % 4096 - 2048) for s in range(samples)]
        items.append((i, base))
        if made < n_variants:
            made += 1
            var = [
                max(min(v + ((s * 11 + i) % 17 - 8), 32767), -32768)
                for s, v in enumerate(base)
            ]
            items.append((i + 2000, var))

    hashes: list[tuple[int, int]] = []
    for mid, x in items:
        nsamp = len(x)
        bounds = [(w * nsamp) // n_windows for w in range(n_windows + 1)]
        e = [
            sum(v * v for v in x[bounds[w] : bounds[w + 1]])
            for w in range(n_windows)
        ]
        bits = [1 if e[j + 1] > e[j] else 0 for j in range(n_windows - 1)]
        hashes.append((mid, _phash_bits_pack(bits)))

    rows = []
    for ai in range(len(hashes)):
        for bi in range(ai + 1, len(hashes)):
            ida, ha = hashes[ai]
            idb, hb = hashes[bi]
            if ida > idb:
                ida, idb, ha, hb = idb, ida, hb, ha
            if not any(
                ((ha >> (b * 8)) & 0xFF) == ((hb >> (b * 8)) & 0xFF) for b in range(8)
            ):
                continue
            ham = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                rows.append((ida, idb, ham))
    return sorted(rows)


def ref_video_near_dup(
    n: int = 64, n_variants: int = 8, max_hamming: int = 6, min_frames: int = 2
) -> list[tuple]:
    """(id_a, id_b, n_frames_matched) — sequential aligned-frame video
    near-dup: re-derive base + jittered videos, per-frame independent
    bilinear 9×8 dHash, same-index band-candidate rule, exact Hamming,
    pair survives at ≥ min_frames matching indices."""
    videos: list[tuple[int, list[int], int, int]] = []  # (id, frame_hashes, ...)
    made = 0
    for i in range(n):
        if ("image", "audio", "video")[i % 3] != "video":
            continue
        w, h = 16 + (i % 4) * 4, 12 + (i % 3) * 4
        n_frames = 2 + i % 3
        def frame_hash(px):
            g9 = _bilinear_ref(px, 9, 8)
            bits = [1 if g9[y][x + 1] > g9[y][x] else 0 for y in range(8) for x in range(8)]
            return _phash_bits_pack(bits)
        base_hashes = []
        var_hashes = []
        for f in range(n_frames):
            bpx = [
                [float((((x + y + f * 8 + i) % 2) * 255)) for x in range(w)]
                for y in range(h)
            ]
            base_hashes.append(frame_hash(bpx))
            vpx = [
                [
                    float(
                        min(
                            max(
                                (((x + y + f * 8 + i) % 2) * 255)
                                + ((x * 5 + y * 3 + f + i) % 5 - 2),
                                0,
                            ),
                            255,
                        )
                    )
                    for x in range(w)
                ]
                for y in range(h)
            ]
            var_hashes.append(frame_hash(vpx))
        videos.append((i, base_hashes))
        if made < n_variants:
            made += 1
            videos.append((i + 3000, var_hashes))

    rows = []
    for ai in range(len(videos)):
        for bi in range(ai + 1, len(videos)):
            ida, ha = videos[ai]
            idb, hb = videos[bi]
            if ida > idb:
                ida, idb, ha, hb = idb, ida, hb, ha
            nm = 0
            for k in range(min(len(ha), len(hb))):
                fa, fb = ha[k], hb[k]
                if not any(
                    ((fa >> (b * 8)) & 0xFF) == ((fb >> (b * 8)) & 0xFF)
                    for b in range(8)
                ):
                    continue
                if bin((fa ^ fb) & ((1 << 64) - 1)).count("1") <= max_hamming:
                    nm += 1
            if nm >= min_frames:
                rows.append((ida, idb, nm))
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


def ref_tokenizer_fertility(sf_dir: str, n_merges: int = 10) -> list[tuple]:
    """(lang, n_docs, n_words, n_tokens, fertility_ppm,
    chars_per_token_ppm) — sequential mirror of the per-language
    tokenizer-fertility report (engine: plans/extensions.py:
    ops_tokenizer_fertility): re-uses ref_bpe_encode's independent
    train+encode, joins lang from the parquet, integer-DIV ppm ratios."""
    import os as _os

    import pyarrow.parquet as pq

    enc = ref_bpe_encode(sf_dir, n_merges)
    tb = pq.read_table(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    lang_of = dict(zip(tb.column("doc_id").to_pylist(), tb.column("lang").to_pylist()))
    agg: dict[str, list[int]] = {}
    for doc_id, n_words, n_tokens, n_chars in enc:
        a = agg.setdefault(lang_of[doc_id], [0, 0, 0, 0])
        a[0] += 1
        a[1] += n_words
        a[2] += n_tokens
        a[3] += n_chars
    rows = []
    for lang in sorted(agg):
        n_docs, w, t, c = agg[lang]
        rows.append((lang, n_docs, w, t, (t * 10**6) // w, (c * 10**6) // t))
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


def ref_lsh_eval(sf_dir: str, sample_n: int = 50) -> list[tuple]:
    """Sequential mirror of the LSH quality evaluation: 50 corpus docs +
    one planted near-dup variant each, exact all-pairs Jaccard ground
    truth vs the banded MinHash candidate set (threshold 0 keeps every
    candidate)."""
    docs = [(d, t) for d, t in _documents(sf_dir) if d < sample_n]
    docs = docs + [(d + 10000, (t or "") + " xvariant") for d, t in docs]
    cand = {(a, b) for a, b, _, _ in _minhash_verified_pairs(docs, 0, 1)}
    # exact ground truth over all pairs
    shingles = {}
    for doc_id, text in docs:
        ws = WORD_RE.findall((text or "").lower())
        if len(ws) <= 3:
            grams = [" ".join(ws)]
        else:
            grams = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        shingles[doc_id] = frozenset(grams)
    ids = sorted(shingles)
    truth = set()
    n_pairs = 0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            n_pairs += 1
            sa, sb = shingles[ids[i]], shingles[ids[j]]
            inter = len(sa & sb)
            union = max(len(sa | sb), 1)
            if 2 * inter >= union:
                truth.add((ids[i], ids[j]))
    tp = len(cand & truth)
    n_true, n_cand = len(truth), len(cand)
    return [
        (
            n_pairs,
            n_true,
            n_cand,
            tp,
            (1000000 * tp) // max(n_true, 1),
            (1000000 * tp) // max(n_cand, 1),
        )
    ]


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
    JVM's strict left-to-right fold over the RAW float arrays —
    per-element products round to float32 (Spark float×float) before the
    double accumulator — ×1e6 fixed-point floor."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    X32 = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    X = X32.astype(np.float64)
    planes = np.random.RandomState(seed).randn(X.shape[1], n_bits)
    bits = (X @ planes) > 0
    sig = {}
    for row_i, vid in enumerate(ids):
        val = 0
        for j in range(n_bits):
            if bits[row_i, j]:
                val |= 1 << j
        sig[vid] = val - (1 << 63)

    def fold_dot(a32, b32) -> float:
        # Spark float×float multiplies in float32, THEN widens into the
        # double accumulator — mirror that rounding exactly
        acc = 0.0
        for x, y in zip(a32, b32):
            acc = acc + float(np.float32(x) * np.float32(y))
        return acc

    vecs = {vid: X32[i] for i, vid in enumerate(ids)}
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


def _read_embeddings(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return t.column("vec_id").to_pylist(), np.array(
        t.column("embedding").to_pylist(), dtype=np.float64
    )


def _unit_rows_ref(M):
    import numpy as np

    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _spherical_kmeans_ref(X, k: int, seed: int = 42, iters: int = 8):
    """Mirror of the engine's driver-side spherical kmeans++ (same seeded
    RandomState call sequence, same Lloyd update order)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(X)
    k = min(k, n)
    idx = [int(rng.randint(n))]
    d2 = 1.0 - X @ X[idx[0]]
    for _ in range(k - 1):
        p = np.maximum(d2, 1e-12)
        i = int(rng.choice(n, p=p / p.sum()))
        idx.append(i)
        d2 = np.minimum(d2, 1.0 - X @ X[i])
    C = X[idx].copy()
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        for c in range(k):
            members = X[a == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _unit_rows_ref(C)
    return C


def _fold_cos(a, b) -> float:
    """The JVM cosine: strict left-to-right aggregate folds for the dot
    product and both norms, float64 arithmetic per element."""
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def ref_knn_ivf(
    sf_dir: str,
    n_centroids: int = 32,
    train_iters: int = 1,
    k: int = 10,
    nprobe: int = 28,
    seed: int = 42,
    n_queries: int = 8,
) -> list[tuple]:
    """(query_id, vec_id, rank, cos_ppm) — sequential IVF ANN mirroring
    the distributed path at the gate's single-batch scale: kmeans++
    spherical training + one Lloyd refinement, raw-vector cosine argmax
    assignment, per-query probe ranking by the JVM fold cosine, cell-local
    GEMM top-k, global (cos desc, id) ranking."""
    import math

    import numpy as np

    ids, X = _read_embeddings(sf_dir)
    # --- ivf_centroids_pp: stride-1 sample = whole corpus in scan order
    Xs = _unit_rows_ref(X)
    C = _spherical_kmeans_ref(Xs, n_centroids, seed=seed)
    # --- ivf_train refinements (single partial batch at this scale)
    kk_ = len(C)
    for _ in range(train_iters):
        cmat = _unit_rows_ref(np.asarray([list(map(float, row)) for row in C]))
        a = np.argmax(Xs @ cmat.T, axis=1)
        sums = np.zeros_like(cmat)
        np.add.at(sums, a, Xs)
        counts = np.bincount(a, minlength=kk_)
        new = cmat.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        C = _unit_rows_ref(new)
    cents = np.asarray([list(map(float, row)) for row in C])
    # --- ivf_assign: raw vectors, normalized similarity, first-max argmax
    vnorm = np.linalg.norm(X, axis=1)
    vnorm[vnorm == 0] = 1.0
    cnorm = np.linalg.norm(cents, axis=1)
    cnorm[cnorm == 0] = 1.0
    sims = (X @ cents.T) / (vnorm[:, None] * cnorm[None, :])
    assign = np.argmax(sims, axis=1)
    # --- probe selection: JVM fold cosine of each (query, centroid)
    qidx = [i for i, vid in enumerate(ids) if vid < n_queries]
    probes: list[tuple[int, int]] = []  # (query_id, cell), sorted
    for i in qidx:
        qcos = [(-_fold_cos(X[i], cents[c]), c) for c in range(len(cents))]
        qcos.sort()
        for _, c in qcos[:nprobe]:
            probes.append((ids[i], c))
    probes.sort()
    by_cell: dict[int, list[int]] = {}
    for qid, c in probes:
        by_cell.setdefault(c, []).append(qid)
    pos_of = {vid: i for i, vid in enumerate(ids)}
    # --- cell-local GEMM top-k (members in scan order, argpartition)
    cand: dict[int, list[tuple[float, int]]] = {qid: [] for qid, _ in probes}
    for cell in sorted(by_cell):
        qids_c = by_cell[cell]
        Qn = _unit_rows_ref(np.asarray([X[pos_of[q]] for q in qids_c]))
        members = [i for i in range(len(ids)) if assign[i] == cell]
        if not members:
            continue
        Cn = _unit_rows_ref(X[members])
        S = Cn @ Qn.T
        mids = np.asarray([ids[i] for i in members])
        kk = min(k, len(members))
        for j, qid in enumerate(qids_c):
            top = np.argpartition(-S[:, j], kk - 1)[:kk]
            for t_ in top:
                cand[qid].append((float(S[t_, j]), int(mids[t_])))
    rows = []
    for qid in sorted(cand):
        ordered = sorted(cand[qid], key=lambda sv: (-sv[0], sv[1]))[:k]
        for rank, (cos, vid) in enumerate(ordered, start=1):
            rows.append((qid, vid, rank, math.floor(cos * 1e6)))
    return rows


# ---------------------------------------------------------------------------
# pure-Python xxHash64 (Spark's xxhash64 for the seeded-sample orderings)
# ---------------------------------------------------------------------------

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 (public reference algorithm) — bit-equal to Spark's
    ``xxhash64`` expression at the same seed; validated against a live
    session in tests."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i : i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i : i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i : i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * P1) + P4) & MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK
        h = ((_rotl(h, 23) * P2) + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    v = xxh64(data, seed)
    return v - (1 << 64) if v >= 1 << 63 else v


def _local_kmeans_ref(X, k: int, seed: int, iters: int = 12):
    """Mirror of the engine's plain-L2 driver-side kmeans (same seeded
    call sequence, same GEMM-form argmin)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(X)
    k = min(k, n)
    cents = [X[rng.randint(n)]]
    d2 = np.full(n, np.inf)
    for _ in range(1, k):
        d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
        tot = d2.sum()
        probs = d2 / tot if tot > 0 else np.full(n, 1.0 / n)
        cents.append(X[rng.choice(n, p=probs)])
    C = np.asarray(cents)
    for _ in range(iters):
        a = (-2.0 * (X @ C.T) + (C**2).sum(axis=1)[None, :]).argmin(axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=k)
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz, None]
    return C


def _hash_sample_order(ids, seed: int):
    """Row order of the engine's deterministic PQ sample: ascending
    (xxhash64(f"{id}:{seed}"), id) — Spark signed-long comparison."""
    return sorted(range(len(ids)), key=lambda i: (xxh64_signed(f"{ids[i]}:{seed}".encode()), ids[i]))


def _fold_cos_double(a, b) -> float:
    """JVM cosine over transform(v -> double(v)) arrays: separate strict
    left-to-right folds, float64 products."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def ref_knn_pq(
    sf_dir: str,
    k: int = 10,
    m: int = 8,
    codes: int = 64,
    rerank: int = 100,
    seed: int = 11,
    n_queries: int = 8,
) -> list[tuple]:
    """(query_id, vec_id, rank) — sequential PQ + ADC + exact rerank
    mirroring pq_topk at the single-batch scale: hash-ordered training
    sample, per-subspace seeded kmeans, unit-vector encoding, per-query
    LUT scan, (adc, id) candidate ranking, exact double-fold cosine
    rerank."""
    import numpy as np

    ids, X = _read_embeddings(sf_dir)
    order = _hash_sample_order(ids, seed)
    Xs = _unit_rows_ref(X[order])
    dsub = Xs.shape[1] // m
    cb = np.stack(
        [_local_kmeans_ref(Xs[:, s * dsub : (s + 1) * dsub], codes, seed + s) for s in range(m)]
    )
    # encode the corpus (scan order)
    Xn = _unit_rows_ref(X)
    codes_mat = np.empty((len(ids), m), dtype=np.int64)
    for s in range(m):
        Cs = cb[s]
        d = -2.0 * (Xn[:, s * dsub : (s + 1) * dsub] @ Cs.T) + (Cs**2).sum(axis=1)[None, :]
        codes_mat[:, s] = d.argmin(axis=1)
    # per-query LUTs (queries in scan order)
    qidx = [i for i, vid in enumerate(ids) if vid < n_queries]
    Q = _unit_rows_ref(X[qidx])
    lut = np.empty((len(qidx), m, codes))
    for s in range(m):
        Qs = Q[:, s * dsub : (s + 1) * dsub]
        Cs = cb[s]
        lut[:, s, :] = ((Qs[:, None, :] - Cs[None, :, :]) ** 2).sum(axis=2)
    keep = max(k, rerank)
    pos_of = {vid: i for i, vid in enumerate(ids)}
    rows = []
    for j, qi in enumerate(qidx):
        d = lut[j][np.arange(m)[None, :], codes_mat].sum(axis=1)
        kk = min(keep, len(ids))
        top = np.argpartition(d, kk - 1)[:kk]
        cands = sorted((float(d[t]), ids[t]) for t in top)[:keep]
        qvec = [float(v) for v in X[qi]]
        rescored = sorted(
            (-_fold_cos_double(qvec, [float(v) for v in X[pos_of[vid]]]), vid)
            for _, vid in cands
        )
        for rank, (_, vid) in enumerate(rescored[:k], start=1):
            rows.append((ids[qi], vid, rank))
    return sorted(rows)


def _ivf_train_ref(X, n_centroids: int, iters: int, seed: int = 42):
    """Mirror of ivf_train at the single-batch scale: stride-1 kmeans++
    sample (whole corpus, scan order) + ``iters`` Lloyd refinements with
    the engine's exact re-normalization round-trips."""
    import numpy as np

    Xs = _unit_rows_ref(X)
    C = _spherical_kmeans_ref(Xs, n_centroids, seed=seed)
    kk_ = len(C)
    for _ in range(iters):
        cmat = _unit_rows_ref(np.asarray([list(map(float, row)) for row in C]))
        a = np.argmax(Xs @ cmat.T, axis=1)
        sums = np.zeros_like(cmat)
        np.add.at(sums, a, Xs)
        counts = np.bincount(a, minlength=kk_)
        new = cmat.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        C = _unit_rows_ref(new)
    return np.asarray([list(map(float, row)) for row in C])


def _ivf_assign_ref(X, cents):
    import numpy as np

    vnorm = np.linalg.norm(X, axis=1)
    vnorm[vnorm == 0] = 1.0
    cnorm = np.linalg.norm(cents, axis=1)
    cnorm[cnorm == 0] = 1.0
    sims = (X @ cents.T) / (vnorm[:, None] * cnorm[None, :])
    return np.argmax(sims, axis=1)


def ref_knn_ivfpq(
    sf_dir: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 14,
    m: int = 8,
    codes: int = 64,
    rerank: int = 200,
    seed: int = 11,
    n_queries: int = 8,
) -> list[tuple]:
    """(query_id, vec_id, rank) — sequential IVF-PQ mirror of ivfpq_topk
    at the single-batch scale: coarse training (ivf seed 42, 2 Lloyd
    refinements), hash-ordered residual codebook sample (pq seed),
    residual encoding, per-(query, cell) LUT ADC scan with per-cell
    candidate caps, exact double-fold cosine rerank."""
    import numpy as np

    ids, X = _read_embeddings(sf_dir)
    cents = _ivf_train_ref(X, n_centroids, iters=2)
    assign = _ivf_assign_ref(X, cents)
    # residual codebooks on the hash-ordered sample (all rows at this sf)
    order = _hash_sample_order(ids, seed)
    Xs = _unit_rows_ref(X[order])
    Rs = Xs - np.asarray([cents[assign[i]] for i in order])
    dsub = Rs.shape[1] // m
    cb = np.stack(
        [_local_kmeans_ref(Rs[:, s * dsub : (s + 1) * dsub], codes, seed + s) for s in range(m)]
    )
    # residual-encode the corpus (scan order, one batch)
    Xn = _unit_rows_ref(X)
    Rm = Xn - np.asarray([cents[c] for c in assign])
    codes_mat = np.empty((len(ids), m), dtype=np.int64)
    for s in range(m):
        Cs = cb[s]
        d = -2.0 * (Rm[:, s * dsub : (s + 1) * dsub] @ Cs.T) + (Cs**2).sum(axis=1)[None, :]
        codes_mat[:, s] = d.argmin(axis=1)
    # probe selection: JVM fold cosine, (qid, cell)-sorted like the engine
    qidx = [i for i, vid in enumerate(ids) if vid < n_queries]
    probes = []
    for i in qidx:
        qcos = [(-_fold_cos(X[i], cents[c]), c) for c in range(len(cents))]
        qcos.sort()
        probes.extend((ids[i], c) for _, c in qcos[:nprobe])
    probes.sort()
    pos_of = {vid: i for i, vid in enumerate(ids)}
    # per-(query, cell) residual LUTs in probe order
    cell_luts: dict[int, list[tuple[int, "np.ndarray"]]] = {}
    for qid, c in probes:
        qv = _unit_rows_ref(np.asarray([X[pos_of[qid]]]))[0] - cents[c]
        lut = np.empty((m, cb.shape[1]))
        for s in range(m):
            lut[s] = ((qv[s * dsub : (s + 1) * dsub][None, :] - cb[s]) ** 2).sum(axis=1)
        cell_luts.setdefault(c, []).append((qid, lut))
    keep = max(k, rerank)
    cand: dict[int, list[tuple[float, int]]] = {}
    for cell in sorted(cell_luts):
        members = [i for i in range(len(ids)) if assign[i] == cell]
        if not members:
            continue
        mcodes = codes_mat[members]
        mids = [ids[i] for i in members]
        kk = min(keep, len(members))
        gather = (np.arange(m)[None, :], mcodes)
        for qid, lut in cell_luts[cell]:
            d = lut[gather].sum(axis=1)
            top = np.argpartition(d, kk - 1)[:kk]
            cand.setdefault(qid, []).extend((float(d[t]), mids[t]) for t in top)
    rows = []
    for qid in sorted(cand):
        adc_top = sorted(cand[qid])[:keep]
        qvec = [float(v) for v in X[pos_of[qid]]]
        rescored = sorted(
            (-_fold_cos_double(qvec, [float(v) for v in X[pos_of[vid]]]), vid)
            for _, vid in adc_top
        )
        for rank, (_, vid) in enumerate(rescored[:k], start=1):
            rows.append((qid, vid, rank))
    return sorted(rows)


def ref_knn_index_probe(
    sf_dir: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 14,
    m: int = 8,
    codes: int = 64,
    rerank: int = 200,
    seed: int = 11,
    n_queries: int = 8,
) -> list[tuple]:
    """(query_id, vec_id, rank) — sequential mirror of the persisted-index
    lifecycle entry: IVF-PQ model trained on the 80% crawl (vec_id%5!=0),
    the 20% crawl folded in with the FROZEN model, queries served over the
    concatenated codes (old then new, each in scan order) with exact
    rerank against the full corpus."""
    import numpy as np

    ids, X = _read_embeddings(sf_dir)
    old_idx = [i for i, vid in enumerate(ids) if vid % 5 != 0]
    new_idx = [i for i, vid in enumerate(ids) if vid % 5 == 0]
    Xold = X[old_idx]
    old_ids = [ids[i] for i in old_idx]
    cents = _ivf_train_ref(Xold, n_centroids, iters=2)
    assign_old = _ivf_assign_ref(Xold, cents)
    order = _hash_sample_order(old_ids, seed)
    Xs = _unit_rows_ref(Xold[order])
    Rs = Xs - np.asarray([cents[assign_old[i]] for i in order])
    dsub = Rs.shape[1] // m
    cb = np.stack(
        [_local_kmeans_ref(Rs[:, s * dsub : (s + 1) * dsub], codes, seed + s) for s in range(m)]
    )

    def encode(Xpart, assign_part):
        Xn = _unit_rows_ref(Xpart)
        Rm = Xn - np.asarray([cents[c] for c in assign_part])
        out = np.empty((len(Xpart), m), dtype=np.int64)
        for s in range(m):
            Cs = cb[s]
            d = -2.0 * (Rm[:, s * dsub : (s + 1) * dsub] @ Cs.T) + (Cs**2).sum(axis=1)[None, :]
            out[:, s] = d.argmin(axis=1)
        return out

    codes_old = encode(Xold, assign_old)
    Xnew = X[new_idx]
    assign_new = _ivf_assign_ref(Xnew, cents)
    codes_new = encode(Xnew, assign_new)
    all_ids = old_ids + [ids[i] for i in new_idx]
    all_assign = np.concatenate([assign_old, assign_new])
    all_codes = np.concatenate([codes_old, codes_new])

    qidx = [i for i, vid in enumerate(ids) if vid < n_queries]
    pos_of = {vid: i for i, vid in enumerate(ids)}
    probes = []
    for i in qidx:
        qcos = [(-_fold_cos(X[i], cents[c]), c) for c in range(len(cents))]
        qcos.sort()
        probes.extend((ids[i], c) for _, c in qcos[:nprobe])
    probes.sort()
    cell_luts: dict[int, list] = {}
    for qid, c in probes:
        qv = _unit_rows_ref(np.asarray([X[pos_of[qid]]]))[0] - cents[c]
        lut = np.empty((m, cb.shape[1]))
        for s in range(m):
            lut[s] = ((qv[s * dsub : (s + 1) * dsub][None, :] - cb[s]) ** 2).sum(axis=1)
        cell_luts.setdefault(c, []).append((qid, lut))
    keep = max(k, rerank)
    cand: dict[int, list] = {}
    for cell in sorted(cell_luts):
        members = [i for i in range(len(all_ids)) if all_assign[i] == cell]
        if not members:
            continue
        mcodes = all_codes[members]
        mids = [all_ids[i] for i in members]
        kk = min(keep, len(members))
        gather = (np.arange(m)[None, :], mcodes)
        for qid, lut in cell_luts[cell]:
            d = lut[gather].sum(axis=1)
            top = np.argpartition(d, kk - 1)[:kk]
            cand.setdefault(qid, []).extend((float(d[t]), mids[t]) for t in top)
    rows = []
    for qid in sorted(cand):
        adc_top = sorted(cand[qid])[:keep]
        qvec = [float(v) for v in X[pos_of[qid]]]
        rescored = sorted(
            (-_fold_cos_double(qvec, [float(v) for v in X[pos_of[vid]]]), vid)
            for _, vid in adc_top
        )
        for rank, (_, vid) in enumerate(rescored[:k], start=1):
            rows.append((qid, vid, rank))
    return sorted(rows)


def _minhash_sig_and_shingles(docs, num_hashes=128, shingle_k=3, seed=42):
    """(sigs, shingle_sets) for an id→text list — the shared signature
    family of the MinHash references."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    A = rng.randint(1, 2**63 - 1, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    B = rng.randint(0, 2**63 - 1, size=num_hashes, dtype=np.uint64)
    sigs, sets_ = {}, {}
    for doc_id, text in docs:
        words = WORD_RE.findall((text or "").lower())
        if len(words) <= shingle_k:
            grams = [" ".join(words)]
        else:
            grams = sorted(
                {" ".join(words[i : i + shingle_k]) for i in range(len(words) - shingle_k + 1)}
            )
        sets_[doc_id] = frozenset(grams)
        H = pd.util.hash_array(np.asarray(grams, dtype=object))
        sigs[doc_id] = (H[:, None] * A[None, :] + B[None, :]).min(axis=0).view(np.int64)
    return sigs, sets_


def ref_incremental_dedup(
    sf_dir: str,
    threshold_num: int = 1,
    threshold_den: int = 2,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    max_bucket: int = 64,
) -> list[tuple]:
    """(id_a=new id, id_b=matched historical id) — sequential mirror of
    the crawl-N+1 dedup entry: median doc_id split (percentile_cont),
    band index over the first half with the per-bucket idx-order cap,
    bucket join of the second half's bands, exact Jaccard ≥ 1/2 verify."""
    docs = _documents(sf_dir)
    ids_sorted = sorted(float(d) for d, _ in docs)
    n = len(ids_sorted)
    h = 0.5 * (n - 1)
    lo = int(h)
    frac = h - lo
    mid = ids_sorted[lo] + frac * (ids_sorted[min(lo + 1, n - 1)] - ids_sorted[lo])
    corpus = [(d, t) for d, t in docs if d <= mid]
    new_batch = [(d, t) for d, t in docs if d > mid]

    sigs, sets_ = _minhash_sig_and_shingles(
        corpus + new_batch, num_hashes, shingle_k
    )
    r = num_hashes // bands
    index: dict[tuple, list[int]] = {}
    for doc_id, _ in corpus:
        s_ = sigs[doc_id]
        for b in range(bands):
            index.setdefault((b, tuple(s_[b * r : (b + 1) * r].tolist())), []).append(doc_id)
    cand = set()
    for doc_id, _ in new_batch:
        s_ = sigs[doc_id]
        for b in range(bands):
            members = index.get((b, tuple(s_[b * r : (b + 1) * r].tolist())), [])
            for idx_id in sorted(members)[:max_bucket]:
                if idx_id != doc_id:
                    cand.add((doc_id, idx_id))
    rows = []
    for id_a, id_b in cand:
        sa, sb = sets_[id_a], sets_[id_b]
        inter = len(sa & sb)
        union = max(len(sa | sb), 1)
        if threshold_den * inter >= threshold_num * union:
            rows.append((id_a, id_b))
    return sorted(rows)


def ref_embedding_cluster(
    sf_dir: str, n_clusters: int = 16, iters: int = 1
) -> list[tuple]:
    """(cluster_id, n_members, cohesion_ppm) — sequential mirror of the
    distributed spherical k-means entry: seeded training, assignment,
    per-cluster member count and the scan-order cosine-to-centroid mean
    (the single-partition aggregation order), ×1e6 fixed-point floor."""
    import math

    ids, X = _read_embeddings(sf_dir)
    cents = _ivf_train_ref(X, n_clusters, iters=iters)
    assign = _ivf_assign_ref(X, cents)
    sums: dict[int, float] = {}
    counts: dict[int, int] = {}
    for i in range(len(ids)):
        c = int(assign[i])
        cos = _fold_cos(X[i], cents[c])
        sums[c] = sums.get(c, 0.0) + cos
        counts[c] = counts.get(c, 0) + 1
    return sorted(
        (c, counts[c], math.floor(sums[c] / counts[c] * 1e6)) for c in counts
    )


def ref_semantic_dedup(
    sf_dir: str, n_clusters: int = 10, threshold: float = 0.5
) -> list[tuple]:
    """(vec_id, cluster, keep) — sequential SemDedup mirror: seeded
    clustering, per-cluster id-ordered unit GEMM, drop any vector with a
    lower-id cluster-mate at cosine ≥ threshold."""
    import numpy as np

    ids, X = _read_embeddings(sf_dir)
    cents = _ivf_train_ref(X, n_clusters, iters=2)
    assign = _ivf_assign_ref(X, cents)
    rows = []
    for c in sorted(set(int(a) for a in assign)):
        members = [i for i in range(len(ids)) if assign[i] == c]
        members.sort(key=lambda i: ids[i])
        Xc = _unit_rows_ref(X[members])
        sims = Xc @ Xc.T
        m = len(members)
        tri = np.triu(sims >= threshold, k=1)
        dropped = tri.any(axis=0)
        for j, i in enumerate(members):
            rows.append((ids[i], c, not bool(dropped[j])))
    return sorted(rows)


def ref_quality_classifier(sf_dir: str, iters: int = 4, ridge: float = 1e-6) -> list[tuple]:
    """Sequential mirror of the IRLS quality classifier (engine:
    functions/classifier.py, entry label = lang=='en').  Features are
    re-derived with ASCII-semantics regexes (Java \\s and \\b are
    ASCII-only — Python needs re.ASCII to match); the Newton loop runs
    the same numpy GEMM shapes the single-batch engine pass runs, and
    scoring replicates the JVM sigmoid in float64 (exp parity verified:
    0/500 floor-ppm mismatches at the pinned scale)."""
    import math
    import re

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    tok_re = re.compile(r"\S+", re.ASCII)
    stop_re = re.compile(
        r"\b(the|a|an|and|or|of|to|in|is|it)\b", re.ASCII
    )
    punct_re = re.compile(r"[.,!?;:]")
    feats, y = [], []
    for txt, lang in zip(texts, langs):
        toks = float(len(tok_re.findall(txt)))
        stops = float(len(stop_re.findall(txt.lower())))
        punct = float(len(punct_re.findall(txt)))
        chars = float(len(txt))
        feats.append(
            [
                1.0,
                toks / (toks + 64.0),
                min(stops * 5.0 / max(toks, 1.0), 1.0),
                min(punct * 10.0 / max(chars, 1.0), 1.0),
                min(chars / max(toks, 1.0) / 8.0, 2.0),
            ]
        )
        y.append(1.0 if lang == "en" else 0.0)
    X = np.asarray(feats, dtype=np.float64)
    yv = np.asarray(y, dtype=np.float64)
    d = X.shape[1]
    beta = np.zeros(d)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = p * (1.0 - p)
        H = X.T @ (w[:, None] * X)
        g = X.T @ (yv - p)
        beta = beta + np.linalg.solve(H + ridge * np.eye(d), g)
    b = [float(v) for v in beta]
    rows = []
    for i, did in enumerate(ids):
        z = 0.0
        for bj, xj in zip(b, X[i]):
            z = z + bj * float(xj)
        score = math.floor((1.0 / (1.0 + math.exp(-z))) * 1e6)
        rows.append((did, int(yv[i]), score))
    rows.sort()
    return rows


def ref_leakage_safe_split(
    sf_dir: str, train_pct: int = 90, val_pct: int = 5
) -> list[tuple]:
    """Sequential mirror of the leakage-safe split (engine:
    functions/curation.py:leakage_safe_split): MinHash-verified pairs at
    1/2 over the full corpus, union-find components, split bucket from
    the component representative's md5-prefix mod 100."""
    docs = _documents(sf_dir)
    pairs = _minhash_verified_pairs(docs, 1, 2)
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
    text_of = dict(docs)
    rows = []
    for doc_id, _text in sorted(docs):
        cluster = find(doc_id) if doc_id in parent else doc_id
        rep_text = text_of[cluster] or ""
        bucket = int(hashlib.md5(rep_text.encode("utf-8")).hexdigest()[:8], 16) % 100
        split = (
            "train"
            if bucket < train_pct
            else ("val" if bucket < train_pct + val_pct else "test")
        )
        rows.append((doc_id, cluster, split))
    return rows


def ref_importance_weights_hashed(sf_dir: str, n_buckets: int = 1024) -> list[tuple]:
    """Sequential mirror of the hashed-feature DSIR scorer (engine:
    functions/curation.py:importance_weights_hashed, target lang=='en'):
    bigrams via the WORD_RE word stream, buckets via the validated XXH64
    (signed, pmod), λ from the same ``math.log`` the engine's driver
    computes, per-doc integer fold."""
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()

    def buckets_of(text: str) -> list[int]:
        ws = WORD_RE.findall((text or "").lower())
        out = []
        for a, b in zip(ws, ws[1:]):
            h = xxh64_signed((a + " " + b).encode("utf-8"))
            out.append(((h % n_buckets) + n_buckets) % n_buckets)
        return out

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc_buckets = []
    for text, lang in zip(texts, langs):
        bs = buckets_of(text)
        per_doc_buckets.append(bs)
        is_t = lang == "en"
        for f in bs:
            raw[f] = raw.get(f, 0) + 1
            if is_t:
                tgt[f] = tgt.get(f, 0) + 1
    raw_tot, tgt_tot = sum(raw.values()), sum(tgt.values())
    lam = {}
    for f in range(n_buckets):
        v = math.log((tgt.get(f, 0) + 0.5) / (tgt_tot + 0.5 * n_buckets)) - math.log(
            (raw.get(f, 0) + 0.5) / (raw_tot + 0.5 * n_buckets)
        )
        lam[f] = math.floor(v * 1e6)
    rows = []
    for did, bs in sorted(zip(ids, per_doc_buckets)):
        rows.append((did, len(bs), sum(lam[f] for f in bs)))
    return rows


def ref_quality_calibration(sf_dir: str) -> list[tuple]:
    """Calibration table derived from the classifier mirror's per-doc
    scores: decile = score_ppm // 100000, observed positive rate in
    exact-integer ppm."""
    rows = ref_quality_classifier(sf_dir)
    agg: dict[int, list[int]] = {}
    for _doc, label, score in rows:
        d = score // 100000
        a = agg.setdefault(d, [0, 0])
        a[0] += 1
        a[1] += label
    return [
        (d, n, p, (1000000 * p) // n) for d, (n, p) in sorted(agg.items())
    ]


def ref_mmr_select(
    sf_dir: str, k: int = 10, pool: int = 50, lam: float = 0.7
) -> list[tuple]:
    """Sequential MMR mirror (engine: functions/similarity.py:mmr_select,
    entry seed = vec_id 0): relevance and pairwise similarities via the
    strict left-to-right cosine fold (_fold_cos — bit-equal to the JVM
    aggregate), pool cut by (rel DESC, id ASC), greedy λ-blend in the
    same float64 op order."""
    import math

    ids_all, X = _read_embeddings(sf_dir)
    vecs = [list(map(float, row)) for row in X]
    q = vecs[ids_all.index(0)]
    rel_all = [_fold_cos(v, q) for v in vecs]
    order = sorted(range(len(ids_all)), key=lambda i: (-rel_all[i], ids_all[i]))[:pool]
    ids = [ids_all[i] for i in order]
    vs = [vecs[i] for i in order]
    rel = [rel_all[i] for i in order]
    n = len(ids)
    chosen = [False] * n
    selected: list[int] = []
    sim: dict[tuple[int, int], float] = {}
    rows = []
    for rank in range(1, min(k, n) + 1):
        best_i = -1
        best = None
        for i in range(n):
            if chosen[i]:
                continue
            if not selected:
                score = lam * rel[i]
            else:
                score = lam * rel[i] - (1.0 - lam) * max(sim[(i, j)] for j in selected)
            if best is None or score > best or (score == best and ids[i] < ids[best_i]):
                best_i, best = i, score
        chosen[best_i] = True
        selected.append(best_i)
        for i in range(n):
            if not chosen[i]:
                sim[(i, best_i)] = _fold_cos(vs[i], vs[best_i])
        rows.append(
            (rank, ids[best_i], math.floor(rel[best_i] * 1e6), math.floor(best * 1e6))
        )
    return rows


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


def _unigram_spec(sf_dir: str, n_iters: int = 4, L: int = 5, seed_size: int = 300,
                  prune_keep: float = 0.75):
    """Sequential unigram-LM trainer mirroring the SPEC of
    functions/text.unigram_train (hard-EM Viterbi, +1-floor smoothing,
    (count DESC, piece ASC) seed/prune ordering, strict-``>``
    smallest-start Viterbi ties) — independent implementation, no engine
    code.  Returns (final counts dict, logp_ppm dict)."""
    import math
    from collections import Counter

    wcnt: Counter = Counter()
    for _, text in _documents(sf_dir):
        wcnt.update(re.findall("[a-z]+", (text or "").lower()))

    seed: Counter = Counter()
    for w, c in wcnt.items():
        for s in range(len(w)):
            for l in range(1, min(L, len(w) - s) + 1):
                seed[w[s : s + l]] += c
    singles = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    counts = dict(singles)
    counts.update(dict(multi))

    def logp_of(cs):
        total = sum(max(c, 1) for c in cs.values())
        lt = math.log(total)
        return {p: math.log(max(c, 1)) - lt for p, c in cs.items()}

    def viterbi(w, logp):
        n = len(w)
        neg = float("-inf")
        best = [neg] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for j in range(1, n + 1):
            for i in range(max(0, j - L), j):
                lp = logp.get(w[i:j])
                if lp is None or best[i] == neg:
                    continue
                sc = best[i] + lp
                if sc > best[j]:
                    best[j], back[j] = sc, i
        seg = []
        j = n
        while j > 0:
            seg.append(w[back[j] : j])
            j = back[j]
        return seg[::-1]

    for it in range(n_iters):
        logp = logp_of(counts)
        new: Counter = Counter()
        for w, c in wcnt.items():
            for p in viterbi(w, logp):
                new[p] += c
        counts = {p: new.get(p, 0) for p in counts}
        if it < n_iters - 1:
            alive = sorted(
                ((p, c) for p, c in counts.items() if len(p) >= 2 and c > 0),
                key=lambda pc: (-pc[1], pc[0]),
            )
            kept = alive[: math.ceil(prune_keep * len(alive))]
            counts = {p: c for p, c in counts.items() if len(p) == 1}
            counts.update(dict(kept))

    logp = logp_of(counts)
    ppm = {p: math.floor(lp * 1e6) for p, lp in logp.items()}
    return counts, ppm, viterbi


def ref_unigram_train(sf_dir: str) -> list[tuple]:
    """(rank, piece, cnt, logp_ppm) rows of the sequential unigram
    trainer — the literal oracle for ops_unigram_train."""
    counts, ppm, _ = _unigram_spec(sf_dir)
    ordered = sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))
    return [(i + 1, p, c, ppm[p]) for i, (p, c) in enumerate(ordered)]


def ref_unigram_encode(sf_dir: str, L: int = 5) -> list[tuple]:
    """(doc_id, n_words, n_pieces, pieces_md5) of every document encoded
    with the sequential model via the QUANTIZED ppm scores (the
    persisted-model contract functions/text.unigram_encode declares)."""
    import hashlib
    import math

    _, ppm, _ = _unigram_spec(sf_dir)
    logp = {p: v / 1e6 for p, v in ppm.items()}

    def viterbi(w):
        n = len(w)
        neg = float("-inf")
        best = [neg] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for j in range(1, n + 1):
            for i in range(max(0, j - L), j):
                lp = logp.get(w[i:j])
                if lp is None or best[i] == neg:
                    continue
                sc = best[i] + lp
                if sc > best[j]:
                    best[j], back[j] = sc, i
        seg = []
        j = n
        while j > 0:
            seg.append(w[back[j] : j])
            j = back[j]
        return seg[::-1]

    out = []
    memo: dict[str, list[str]] = {}
    for doc_id, text in _documents(sf_dir):
        ws = re.findall("[a-z]+", (text or "").lower())
        pieces: list[str] = []
        for w in ws:
            seg = memo.get(w)
            if seg is None:
                seg = viterbi(w)
                memo[w] = seg
            pieces.extend(seg)
        out.append(
            (
                doc_id,
                len(ws),
                len(pieces),
                hashlib.md5(" ".join(pieces).encode()).hexdigest(),
            )
        )
    return sorted(out)


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
    oracles["ops_video_near_dup"] = sql_values(
        ref_video_near_dup(),
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("n_frames_matched", "BIGINT")],
    )
    oracles["ops_audio_near_dup"] = sql_values(
        ref_audio_near_dup(),
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
            "ops_bloom_decontaminate": sql_values(
                ref_bloom_decontaminate(_SF_PIN),
                [
                    ("doc_id", "BIGINT"),
                    ("n_grams", "BIGINT"),
                    ("n_hits", "BIGINT"),
                    ("contaminated", "BIGINT"),
                ],
            ),
            "ops_compression_filter": sql_values(
                ref_compression_filter(_SF_PIN),
                [
                    ("doc_id", "BIGINT"),
                    ("raw_bytes", "BIGINT"),
                    ("zlib_bytes", "BIGINT"),
                    ("ratio_ppm", "BIGINT"),
                    ("verdict", "VARCHAR"),
                ],
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
            "ops_embedding_cluster": sql_values(
                ref_embedding_cluster(_SF_PIN),
                [("cluster_id", "INTEGER"), ("n_members", "BIGINT"), ("cohesion_ppm", "BIGINT")],
            ),
            "ops_semantic_dedup": sql_values(
                ref_semantic_dedup(_SF_PIN),
                [("vec_id", "BIGINT"), ("cluster", "INTEGER"), ("keep", "BOOLEAN")],
            ),
            "ops_incremental_dedup": sql_values(
                ref_incremental_dedup(_SF_PIN),
                [("id_a", "BIGINT"), ("id_b", "BIGINT")],
            ),
            "ops_knn_index_probe": sql_values(
                ref_knn_index_probe(_SF_PIN),
                [("query_id", "BIGINT"), ("vec_id", "BIGINT"), ("rank", "BIGINT")],
            ),
            "ops_knn_ivfpq": sql_values(
                ref_knn_ivfpq(_SF_PIN),
                [("query_id", "BIGINT"), ("vec_id", "BIGINT"), ("rank", "BIGINT")],
            ),
            "ops_knn_pq": sql_values(
                ref_knn_pq(_SF_PIN),
                [("query_id", "BIGINT"), ("vec_id", "BIGINT"), ("rank", "BIGINT")],
            ),
            "ops_knn_ivf": sql_values(
                ref_knn_ivf(_SF_PIN),
                [
                    ("query_id", "BIGINT"),
                    ("vec_id", "BIGINT"),
                    ("rank", "BIGINT"),
                    ("cos_ppm", "BIGINT"),
                ],
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
            "ops_quality_calibration": sql_values(
                ref_quality_calibration(_SF_PIN),
                [
                    ("decile", "BIGINT"),
                    ("n_docs", "BIGINT"),
                    ("n_pos", "BIGINT"),
                    ("obs_pos_ppm", "BIGINT"),
                ],
            ),
            "ops_lsh_eval": sql_values(
                ref_lsh_eval(_SF_PIN),
                [
                    ("n_pairs", "BIGINT"),
                    ("n_true", "BIGINT"),
                    ("n_cand", "BIGINT"),
                    ("tp", "BIGINT"),
                    ("recall_ppm", "BIGINT"),
                    ("precision_ppm", "BIGINT"),
                ],
            ),
            "ops_importance_weights_hashed": sql_values(
                ref_importance_weights_hashed(_SF_PIN),
                [("doc_id", "BIGINT"), ("n_feat", "BIGINT"), ("dsir_ppm", "BIGINT")],
            ),
            "ops_leakage_safe_split": sql_values(
                ref_leakage_safe_split(_SF_PIN),
                [("doc_id", "BIGINT"), ("cluster_id", "BIGINT"), ("split", "VARCHAR")],
            ),
            "ops_quality_classifier": sql_values(
                ref_quality_classifier(_SF_PIN),
                [("doc_id", "BIGINT"), ("label", "BIGINT"), ("score_ppm", "BIGINT")],
            ),
            "ops_mmr_select": sql_values(
                ref_mmr_select(_SF_PIN),
                [
                    ("sel_rank", "BIGINT"),
                    ("vec_id", "BIGINT"),
                    ("rel_ppm", "BIGINT"),
                    ("mmr_ppm", "BIGINT"),
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
            "ops_bpe_bytes_train": sql_values(
                ref_bpe_bytes_train(_SF_PIN),
                [
                    ("merge_rank", "BIGINT"),
                    ("left_sym", "VARCHAR"),
                    ("right_sym", "VARCHAR"),
                    ("merged", "VARCHAR"),
                    ("pair_count", "BIGINT"),
                ],
            ),
            "ops_bpe_bytes_encode": sql_values(
                ref_bpe_bytes_encode(_SF_PIN),
                [
                    ("doc_id", "BIGINT"),
                    ("n_words", "BIGINT"),
                    ("n_tokens", "BIGINT"),
                    ("n_bytes", "BIGINT"),
                ],
            ),
            "ops_token_packing_bfd": sql_values(
                ref_token_packing_bfd(_SF_PIN),
                [
                    ("lang", "VARCHAR"),
                    ("seq_id", "BIGINT"),
                    ("n_docs", "BIGINT"),
                    ("seq_tokens", "BIGINT"),
                    ("fill_ppm", "BIGINT"),
                ],
            ),
            "ops_wordpiece_train": sql_values(
                ref_wordpiece_train(_SF_PIN),
                [
                    ("merge_rank", "BIGINT"),
                    ("left_sym", "VARCHAR"),
                    ("right_sym", "VARCHAR"),
                    ("merged", "VARCHAR"),
                    ("pair_count", "BIGINT"),
                    ("left_count", "BIGINT"),
                    ("right_count", "BIGINT"),
                ],
            ),
            "ops_wordpiece_encode": sql_values(
                ref_wordpiece_encode(_SF_PIN),
                [
                    ("doc_id", "BIGINT"),
                    ("n_words", "BIGINT"),
                    ("n_pieces", "BIGINT"),
                    ("n_unk", "BIGINT"),
                    ("pieces_md5", "VARCHAR"),
                ],
            ),
            "ops_tokenizer_fertility": sql_values(
                ref_tokenizer_fertility(_SF_PIN),
                [
                    ("lang", "VARCHAR"),
                    ("n_docs", "BIGINT"),
                    ("n_words", "BIGINT"),
                    ("n_tokens", "BIGINT"),
                    ("fertility_ppm", "BIGINT"),
                    ("chars_per_token_ppm", "BIGINT"),
                ],
            ),
            "ops_langid_train": sql_values(
                ref_langid_train(_SF_PIN),
                [
                    ("lang", "VARCHAR"),
                    ("n_docs", "BIGINT"),
                    ("n_grams", "BIGINT"),
                    ("buckets_hit", "BIGINT"),
                    ("model_md5", "VARCHAR"),
                ],
            ),
            "ops_langid": sql_values(
                ref_langid(_SF_PIN),
                [
                    ("doc_id", "BIGINT"),
                    ("lang_pred", "VARCHAR"),
                    ("margin_ppm", "BIGINT"),
                ],
            ),
            "ops_curation_funnel_gopher": sql_values(
                ref_curation_funnel_gopher(_SF_PIN),
                [
                    ("stage_rank", "INTEGER"),
                    ("stage", "VARCHAR"),
                    ("n_in", "BIGINT"),
                    ("n_rejected", "BIGINT"),
                    ("n_out", "BIGINT"),
                ],
            ),
            "ops_curation_funnel_langid": sql_values(
                ref_curation_funnel_langid(_SF_PIN),
                [
                    ("stage_rank", "INTEGER"),
                    ("stage", "VARCHAR"),
                    ("n_in", "BIGINT"),
                    ("n_rejected", "BIGINT"),
                    ("n_out", "BIGINT"),
                ],
            ),
            "ops_unigram_train": sql_values(
                ref_unigram_train(_SF_PIN),
                [
                    ("rank", "BIGINT"),
                    ("piece", "VARCHAR"),
                    ("cnt", "BIGINT"),
                    ("logp_ppm", "BIGINT"),
                ],
            ),
            "ops_unigram_encode": sql_values(
                ref_unigram_encode(_SF_PIN),
                [
                    ("doc_id", "BIGINT"),
                    ("n_words", "BIGINT"),
                    ("n_pieces", "BIGINT"),
                    ("pieces_md5", "VARCHAR"),
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
