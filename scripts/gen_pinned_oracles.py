#!/usr/bin/env python
"""Regenerate ``akf_cdparser_spark/plans/pinned.py`` — the expected tables
behind the q47 / q48 oracles.

Both tables are computed through SEQUENTIAL, NON-SPARK paths, so the driver
oracle verifies the distributed execution (mapInPandas over the corpus,
Arrow transport, shuffle determinism) against an independent run:

* q47 (A4 coverage diff, ref lib/validator.js:21-58): the local kernel
  parses each of the EXTRACT_N_DOCS synthetic docs in-process and
  ``coverage_stats`` counts the unparsed remainder — no Spark involved.
  The ratio is pinned with Spark's ROUND_HALF_UP semantics (exact Decimal
  quantize of the IEEE double) so the oracle literal is bit-identical to
  ``F.round(u / greatest(f, 1), 6)``.
* q48 (ANN recall gate): a numpy re-implementation of BOTH the brute-force
  cosine top-k and the banded-LSH bucketing (md5 hyperplanes, sign
  signatures, 4-dp half-up rounding before ranking, (cosine desc, vec_id
  asc) tie order) over the sf0.01 embeddings parquet — independent of the
  ``analytics.similarity`` DataFrame code. Pinned AT sf0.01 only: that is
  the scale the driver's correctness gate runs oracles at (TESTDATA.md);
  the Spark query itself runs at any sf.

``tests/test_pinned_oracles.py`` re-runs this module's computations and
asserts they still match the pinned tables (drift gate).
"""

from __future__ import annotations

import hashlib
import os
import sys
from decimal import Decimal, ROUND_HALF_UP

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF001 = "/root/testdata/sf0.01"


def spark_round(x: float, scale: int) -> float:
    """Spark's ROUND (HALF_UP on the exact binary expansion of the double)."""
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def q47_rows() -> list[tuple[str, int, int, float]]:
    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.kernel import parse_document
    from akf_cdparser_spark.kernel.coverage import coverage_stats
    from akf_cdparser_spark.plans.queries import EXTRACT_N_DOCS

    rows = []
    for i in range(EXTRACT_N_DOCS):
        rec, _, _ = parse_document(fixtures.synth_html(i, EXTRACT_N_DOCS))
        u, f = coverage_stats(rec)
        rows.append((fixtures.doc_id_for(i), u, f,
                     spark_round(u / max(f, 1), 6)))
    return rows


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Twin of analytics.similarity._hyperplane (md5 mix, no RNG state)."""
    out = np.empty((n_planes, dim))
    for p in range(n_planes):
        for j in range(dim):
            h = hashlib.md5(f"{p}:{j}".encode()).hexdigest()
            out[p, j] = (int(h[:8], 16) / float(0x7FFFFFFF)) - 1.0
    return out


def q48_rows(query_ids=(0, 7, 42, 99, 123), k=5, n_bands=8,
             planes_per_band=3, dim=64) -> list[tuple[int, float]]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF001, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_numpy()
    emb = np.array([np.asarray(v, dtype=np.float64)
                    for v in t.column("embedding").to_pylist()])
    order = np.argsort(vec_ids)
    vec_ids, emb = vec_ids[order], emb[order]
    norms = np.sqrt((emb * emb).sum(axis=1))

    def topk(qid: int, cand_mask: np.ndarray) -> list[int]:
        qi = int(np.searchsorted(vec_ids, qid))
        assert vec_ids[qi] == qid
        mask = cand_mask.copy()
        mask[qi] = False
        idx = np.nonzero(mask)[0]
        cos = (emb[idx] @ emb[qi]) / (norms[idx] * norms[qi])
        cos = np.array([spark_round(c, 4) for c in cos])
        # (cosine desc, vec_id asc): sort by (-cos, vec_id)
        sel = sorted(range(len(idx)), key=lambda j: (-cos[j], vec_ids[idx[j]]))
        return [int(vec_ids[idx[j]]) for j in sel[:k]]

    # banded sign signatures over md5 hyperplanes
    planes = _hyperplanes(dim, n_bands * planes_per_band)
    bits = (emb @ planes.T) >= 0  # (n, n_bands*ppb)
    sigs = bits.reshape(len(emb), n_bands, planes_per_band)

    all_mask = np.ones(len(emb), dtype=bool)
    rows = []
    for qid in query_ids:
        qi = int(np.searchsorted(vec_ids, qid))
        shares = (sigs == sigs[qi]).all(axis=2).any(axis=1)
        true_k = topk(qid, all_mask)
        ann_k = topk(qid, shares)
        recall = spark_round(len(set(true_k) & set(ann_k)) / len(true_k), 4)
        rows.append((int(qid), recall))
    return rows


def q65_rows(query_ids=(0, 7, 42, 99, 123), k=5, n_lists=16, n_assign=3,
             n_probe=4) -> list[tuple[int, float]]:
    """Numpy twin of the IVF ANN recall gate (analytics.similarity
    cosine_topk_ivf): sampling coarse quantizer = the n_lists vectors ranked
    first by (md5(str(vec_id)) hex, vec_id); centroid cosines rounded half-up
    to 6 dp before ranking; each corpus vector sits in its n_assign nearest
    lists (ties -> lower list_id), queries probe their n_probe nearest;
    candidates = any shared list; exact cosine (4 dp, desc, vec_id asc)
    ranks. Independent of the DataFrame code; pinned AT sf0.01 only."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF001, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_numpy()
    emb = np.array([np.asarray(v, dtype=np.float64)
                    for v in t.column("embedding").to_pylist()])
    order = np.argsort(vec_ids)
    vec_ids, emb = vec_ids[order], emb[order]
    norms = np.sqrt((emb * emb).sum(axis=1))
    n = len(emb)

    def topk(qid: int, cand_mask: np.ndarray) -> list[int]:
        qi = int(np.searchsorted(vec_ids, qid))
        assert vec_ids[qi] == qid
        mask = cand_mask.copy()
        mask[qi] = False
        idx = np.nonzero(mask)[0]
        cos = (emb[idx] @ emb[qi]) / (norms[idx] * norms[qi])
        cos = np.array([spark_round(c, 4) for c in cos])
        sel = sorted(range(len(idx)), key=lambda j: (-cos[j], vec_ids[idx[j]]))
        return [int(vec_ids[idx[j]]) for j in sel[:k]]

    key = sorted(range(n), key=lambda i: (
        hashlib.md5(str(int(vec_ids[i])).encode()).hexdigest(), vec_ids[i]))
    cents = emb[key[:n_lists]]
    c_norms = np.sqrt((cents * cents).sum(axis=1))
    ccos = (emb @ cents.T) / np.outer(norms, c_norms)
    ccos = np.vectorize(lambda c: spark_round(c, 6))(ccos)

    def top_lists(i: int, m: int) -> list[int]:
        return sorted(range(n_lists), key=lambda l: (-ccos[i, l], l))[:m]

    assign_sets = [set(top_lists(i, n_assign)) for i in range(n)]
    all_mask = np.ones(n, dtype=bool)
    rows = []
    for qid in query_ids:
        qi = int(np.searchsorted(vec_ids, qid))
        probes = set(top_lists(qi, n_probe))
        mask = np.array([bool(assign_sets[i] & probes) for i in range(n)])
        true_k = topk(qid, all_mask)
        ivf_k = topk(qid, mask)
        recall = spark_round(len(set(true_k) & set(ivf_k)) / len(true_k), 4)
        rows.append((int(qid), recall))
    return rows


def q101_rows(query_ids=(0, 7, 42, 99, 123), k=5, n_lists=16, n_assign=3,
              n_probe=4) -> list[tuple[int, float]]:
    """Numpy twin of the int8 IVF recall gate (analytics.similarity
    cosine_topk_ivf_int8): the q65 coarse quantizer + candidate mask
    verbatim (float assignment, 6 dp ccos), but candidates rank by the
    INT8 cosine — floor(v*127/max|v|) codes, exact integer dot products,
    sqrt/divide and 4 dp rounding at the end — against the FLOAT
    brute-force top-k. Pinned AT sf0.01 only."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF001, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_numpy()
    emb = np.array([np.asarray(v, dtype=np.float64)
                    for v in t.column("embedding").to_pylist()])
    order = np.argsort(vec_ids)
    vec_ids, emb = vec_ids[order], emb[order]
    norms = np.sqrt((emb * emb).sum(axis=1))
    n = len(emb)

    s = np.abs(emb).max(axis=1)
    q = np.zeros_like(emb, dtype=np.int64)
    nz = s != 0
    q[nz] = np.floor(emb[nz] * 127.0 / s[nz][:, None]).astype(np.int64)
    qn2 = (q * q).sum(axis=1)

    def topk_float(qid: int, cand_mask: np.ndarray) -> list[int]:
        qi = int(np.searchsorted(vec_ids, qid))
        mask = cand_mask.copy()
        mask[qi] = False
        idx = np.nonzero(mask)[0]
        cos = (emb[idx] @ emb[qi]) / (norms[idx] * norms[qi])
        cos = np.array([spark_round(c, 4) for c in cos])
        sel = sorted(range(len(idx)), key=lambda j: (-cos[j], vec_ids[idx[j]]))
        return [int(vec_ids[idx[j]]) for j in sel[:k]]

    def topk_int8(qid: int, cand_mask: np.ndarray) -> list[int]:
        qi = int(np.searchsorted(vec_ids, qid))
        mask = cand_mask.copy()
        mask[qi] = False
        idx = np.nonzero(mask)[0]
        cos = (q[idx] @ q[qi]) / (np.sqrt(qn2[qi]) * np.sqrt(qn2[idx]))
        cos = np.array([spark_round(c, 4) for c in cos])
        sel = sorted(range(len(idx)), key=lambda j: (-cos[j], vec_ids[idx[j]]))
        return [int(vec_ids[idx[j]]) for j in sel[:k]]

    key = sorted(range(n), key=lambda i: (
        hashlib.md5(str(int(vec_ids[i])).encode()).hexdigest(), vec_ids[i]))
    cents = emb[key[:n_lists]]
    c_norms = np.sqrt((cents * cents).sum(axis=1))
    ccos = (emb @ cents.T) / np.outer(norms, c_norms)
    ccos = np.vectorize(lambda c: spark_round(c, 6))(ccos)

    def top_lists(i: int, m: int) -> list[int]:
        return sorted(range(n_lists), key=lambda l: (-ccos[i, l], l))[:m]

    assign_sets = [set(top_lists(i, n_assign)) for i in range(n)]
    all_mask = np.ones(n, dtype=bool)
    rows = []
    for qid in query_ids:
        qi = int(np.searchsorted(vec_ids, qid))
        probes = set(top_lists(qi, n_probe))
        mask = np.array([bool(assign_sets[i] & probes) for i in range(n)])
        true_k = topk_float(qid, all_mask)
        ivf_k = topk_int8(qid, mask)
        recall = spark_round(len(set(true_k) & set(ivf_k)) / len(true_k), 4)
        rows.append((int(qid), recall))
    return rows

def q110_rows(query_ids=(0, 7, 42, 99, 123), k=5, dim=64, m_sub=8, ks=16,
              rerank_r=150) -> list[tuple[int, float]]:
    """Numpy twin of the PQ-ADC recall gate (analytics.similarity
    pq_topk_adc): unit-normalized vectors, codebook = sub-slices of the ks
    vectors ranked first by (md5('pq:'+vec_id), vec_id), per-subspace
    argmin of 6 dp squared-L2 (first-min tie), ADC = left-to-right sum of
    6 dp table entries rounded to 6 dp, shortlist (adist asc, vec_id asc)
    of rerank_r, exact-cosine rerank (4 dp, desc, vec_id asc) — recall@k
    vs the float brute force. Pinned AT sf0.01 only."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF001, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_numpy()
    emb = np.array([np.asarray(v, dtype=np.float64)
                    for v in t.column("embedding").to_pylist()])
    order = np.argsort(vec_ids)
    vec_ids, emb = vec_ids[order], emb[order]
    norms = np.sqrt((emb * emb).sum(axis=1))
    n = len(emb)
    u = emb.copy()
    nz = norms != 0
    u[nz] = emb[nz] / norms[nz][:, None]
    d = dim // m_sub

    key = sorted(range(n), key=lambda i: (
        hashlib.md5(f"pq:{int(vec_ids[i])}".encode()).hexdigest(),
        vec_ids[i]))
    books = [[u[key[c]][m * d:(m + 1) * d] for c in range(ks)]
             for m in range(m_sub)]

    def encode(vi: int) -> list[int]:
        codes = []
        for m in range(m_sub):
            sub = u[vi][m * d:(m + 1) * d]
            dist = [spark_round(float(((sub - books[m][c]) ** 2).sum()), 6)
                    for c in range(ks)]
            codes.append(dist.index(min(dist)))     # first min = lowest code
        return codes

    all_codes = [encode(i) for i in range(n)]

    def topk_float(qid: int, cand_mask: np.ndarray) -> list[int]:
        qi = int(np.searchsorted(vec_ids, qid))
        mask = cand_mask.copy()
        mask[qi] = False
        idx = np.nonzero(mask)[0]
        cos = (emb[idx] @ emb[qi]) / (norms[idx] * norms[qi])
        cos = np.array([spark_round(c, 4) for c in cos])
        sel = sorted(range(len(idx)), key=lambda j: (-cos[j], vec_ids[idx[j]]))
        return [int(vec_ids[idx[j]]) for j in sel[:k]]

    all_mask = np.ones(n, dtype=bool)
    rows = []
    for qid in query_ids:
        qi = int(np.searchsorted(vec_ids, qid))
        dtab = [[spark_round(
            float(((u[qi][m * d:(m + 1) * d] - books[m][c]) ** 2).sum()), 6)
            for c in range(ks)] for m in range(m_sub)]
        adist = {}
        for i in range(n):
            if i == qi:
                continue
            acc = 0.0
            for m in range(m_sub):        # left-to-right fold, like Spark
                acc = acc + dtab[m][all_codes[i][m]]
            adist[i] = spark_round(acc, 6)
        short = sorted(adist, key=lambda i: (adist[i], vec_ids[i]))[:rerank_r]
        cos = {i: spark_round(float(u[i] @ u[qi]), 4) for i in short}
        pq_k = [int(vec_ids[i]) for i in
                sorted(short, key=lambda i: (-cos[i], vec_ids[i]))[:k]]
        true_k = topk_float(qid, all_mask)
        rows.append((int(qid),
                     spark_round(len(set(true_k) & set(pq_k)) / len(true_k),
                                 4)))
    return rows


def q112_rows(query_ids=(0, 7, 42, 99, 123), k=5, dim=64, n_lists=16,
              n_assign=3, n_probe=4, m_sub=8, ks=16,
              rerank_r=150) -> list[tuple[int, float]]:
    """Numpy twin of the IVF-PQ recall gate (analytics.similarity
    cosine_topk_ivfpq): the q65 coarse-quantizer candidate mask verbatim
    (md5(vec_id) centroid sample, 6 dp ccos, top n_assign / n_probe
    lists), then the q110 PQ pipeline verbatim WITHIN the mask (md5
    'pq:'-keyed codebook, 6 dp argmin encode, left-to-right ADC fold,
    rerank_r exact-cosine rerank) — recall@k vs the all-corpus float
    brute force. Pinned AT sf0.01 only."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF001, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_numpy()
    emb = np.array([np.asarray(v, dtype=np.float64)
                    for v in t.column("embedding").to_pylist()])
    order = np.argsort(vec_ids)
    vec_ids, emb = vec_ids[order], emb[order]
    norms = np.sqrt((emb * emb).sum(axis=1))
    n = len(emb)

    # --- q65 coarse quantizer: candidate mask ---
    key = sorted(range(n), key=lambda i: (
        hashlib.md5(str(int(vec_ids[i])).encode()).hexdigest(), vec_ids[i]))
    cents = emb[key[:n_lists]]
    c_norms = np.sqrt((cents * cents).sum(axis=1))
    ccos = (emb @ cents.T) / np.outer(norms, c_norms)
    ccos = np.vectorize(lambda c: spark_round(c, 6))(ccos)

    def top_lists(i: int, m: int) -> list[int]:
        return sorted(range(n_lists), key=lambda l: (-ccos[i, l], l))[:m]

    assign_sets = [set(top_lists(i, n_assign)) for i in range(n)]

    # --- q110 PQ: unit vectors, codebook, codes ---
    u = emb.copy()
    nz = norms != 0
    u[nz] = emb[nz] / norms[nz][:, None]
    d = dim // m_sub
    pkey = sorted(range(n), key=lambda i: (
        hashlib.md5(f"pq:{int(vec_ids[i])}".encode()).hexdigest(),
        vec_ids[i]))
    books = [[u[pkey[c]][m * d:(m + 1) * d] for c in range(ks)]
             for m in range(m_sub)]

    def encode(vi: int) -> list[int]:
        codes = []
        for m in range(m_sub):
            sub = u[vi][m * d:(m + 1) * d]
            dist = [spark_round(float(((sub - books[m][c]) ** 2).sum()), 6)
                    for c in range(ks)]
            codes.append(dist.index(min(dist)))
        return codes

    all_codes = [encode(i) for i in range(n)]

    def topk_float(qid: int) -> list[int]:
        qi = int(np.searchsorted(vec_ids, qid))
        mask = np.ones(n, dtype=bool)
        mask[qi] = False
        idx = np.nonzero(mask)[0]
        cos = (emb[idx] @ emb[qi]) / (norms[idx] * norms[qi])
        cos = np.array([spark_round(c, 4) for c in cos])
        sel = sorted(range(len(idx)), key=lambda j: (-cos[j], vec_ids[idx[j]]))
        return [int(vec_ids[idx[j]]) for j in sel[:k]]

    rows = []
    for qid in query_ids:
        qi = int(np.searchsorted(vec_ids, qid))
        probes = set(top_lists(qi, n_probe))
        dtab = [[spark_round(
            float(((u[qi][m * d:(m + 1) * d] - books[m][c]) ** 2).sum()), 6)
            for c in range(ks)] for m in range(m_sub)]
        adist = {}
        for i in range(n):
            if i == qi or not (assign_sets[i] & probes):
                continue
            acc = 0.0
            for m in range(m_sub):
                acc = acc + dtab[m][all_codes[i][m]]
            adist[i] = spark_round(acc, 6)
        short = sorted(adist, key=lambda i: (adist[i], vec_ids[i]))[:rerank_r]
        cos = {i: spark_round(float(u[i] @ u[qi]), 4) for i in short}
        got_k = [int(vec_ids[i]) for i in
                 sorted(short, key=lambda i: (-cos[i], vec_ids[i]))[:k]]
        true_k = topk_float(qid)
        rows.append((int(qid),
                     spark_round(len(set(true_k) & set(got_k)) / len(true_k),
                                 4)))
    return rows


def q113_rows(pool: int = 13) -> list[tuple]:
    """Sequential twin of q113 (media dedup over the interleaved store):
    per doc, the media refs from the synthetic spans; payloads from the
    POOLED synthesizer (sha256(ref) mod pool — the synth_media_pooled
    rule); exact dedup = group by sha256(payload), canonical = min ref.
    No Spark anywhere."""
    import hashlib as _h

    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.analytics import multimodal as mm
    from akf_cdparser_spark.plans.queries import EXTRACT_N_DOCS

    refs = []
    for i in range(EXTRACT_N_DOCS):
        spans = fixtures.html_to_spans(fixtures.synth_html(i, EXTRACT_N_DOCS))
        refs.extend(s["media_ref"] for s in spans if s["kind"] == "media")
    per_ref = {}
    for ref in refs:
        payload, _w, _h2 = mm.synth_ppm_pooled(ref, pool)
        per_ref[ref] = (_h.sha256(payload).hexdigest(), len(payload))
    by_hash: dict[str, list[str]] = {}
    for ref, (hx, _n) in per_ref.items():
        by_hash.setdefault(hx, []).append(ref)
    rows = []
    for ref, (hx, nb) in per_ref.items():
        members = by_hash[hx]
        rows.append((ref, min(members), hx, nb, len(members)))
    return sorted(rows)


def q114_rows(pool: int = 13, jitter: int = 3,
              max_hamming: int = 3) -> list[tuple]:
    """Sequential twin of q114 (perceptual media near-dups): the q113
    refs with POOLED + JITTERED payloads (mm.synth_ppm_pooled — the same
    single-sourced rule the Spark synthesizer runs), dhash64 on each
    (also single-sourced), then ALL-PAIRS Hamming <= max_hamming — which
    equals the banded candidate set exactly (pigeonhole: 4 x 16-bit
    bands, distance <= 3 leaves one band intact), so pinning the
    all-pairs answer gates the banding for completeness too."""
    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.analytics import multimodal as mm
    from akf_cdparser_spark.plans.queries import EXTRACT_N_DOCS

    refs = []
    for i in range(EXTRACT_N_DOCS):
        spans = fixtures.html_to_spans(fixtures.synth_html(i, EXTRACT_N_DOCS))
        refs.extend(s["media_ref"] for s in spans if s["kind"] == "media")
    dh = {}
    for ref in refs:
        payload, _w, _h = mm.synth_ppm_pooled(ref, pool, jitter)
        dh[ref] = mm.dhash64(payload)
    rows = []
    srefs = sorted(dh)
    for ai, a in enumerate(srefs):
        for b in srefs[ai + 1:]:
            x = (dh[a] ^ dh[b]) & ((1 << 64) - 1)
            ham = bin(x).count("1")
            if ham <= max_hamming:
                rows.append((a, b, ham))
    return sorted(rows)


def q115_rows(pool: int = 5, jitter: int = 3,
              max_hamming: int = 3) -> list[tuple]:
    """Sequential twin of q115 (cross-modal perceptual near-dups): the
    corpus refs become image/audio/video payloads via the single-sourced
    mixed pooled rule (mm.synth_pooled_mixed_row), hashed by the
    kind-dispatched dHash family (grid / energy-contour / keyframe), and
    near-dups are ALL same-kind pairs with Hamming <= max_hamming —
    equal to the kind-scoped banded join by pigeonhole."""
    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.analytics import multimodal as mm
    from akf_cdparser_spark.plans.queries import EXTRACT_N_DOCS

    hashers = {"image": mm.dhash64, "audio": mm.audio_dhash64,
               "video": mm.video_dhash64}
    refs = []
    for i in range(EXTRACT_N_DOCS):
        spans = fixtures.html_to_spans(fixtures.synth_html(i, EXTRACT_N_DOCS))
        refs.extend(s["media_ref"] for s in spans if s["kind"] == "media")
    info = {}
    for ref in refs:
        row = mm.synth_pooled_mixed_row(ref, pool, jitter)
        info[ref] = (row["kind"], hashers[row["kind"]](row["content"]))
    rows = []
    srefs = sorted(info)
    for ai, a in enumerate(srefs):
        for b in srefs[ai + 1:]:
            ka, da = info[a]
            kb, db = info[b]
            if ka != kb:
                continue
            ham = bin((da ^ db) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                rows.append((a, b, ka, ham))
    return sorted(rows)


def q116_rows(pool: int = 13) -> list[tuple]:
    """Sequential twin of q116 (interleaved curation capstone): fixtures
    spans + the planted mutants, the q113 pooled-payload dedup walk for
    the media plane, and JAVA-SEMANTICS text ops in pure Python — the
    corpus contains NBSP (\\xa0), which Java's \\s does NOT match and
    Spark's trim does NOT strip, so the twin uses the explicit Java
    whitespace class [ \\t\\n\\x0b\\f\\r] and strips ' ' only (probed
    against the engine: trim('\\xa0x\\xa0') is unchanged, split keeps
    'a\\xa0b' whole)."""
    import hashlib as _h
    import re

    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.analytics import multimodal as mm
    from akf_cdparser_spark.plans.queries import (EXTRACT_N_DOCS,
                                                  q116_planted_rows)

    jws = re.compile(r"[ \t\n\x0b\f\r]+")
    docs = [(fixtures.doc_id_for(i),
             fixtures.html_to_spans(fixtures.synth_html(i, EXTRACT_N_DOCS)))
            for i in range(EXTRACT_N_DOCS)]
    docs += list(q116_planted_rows())

    all_refs = [s["media_ref"] for _d, spans in docs for s in spans
                if s["kind"] == "media"]
    hx = {}
    for ref in all_refs:
        payload, _w, _hh = mm.synth_ppm_pooled(ref, pool)
        hx[ref] = _h.sha256(payload).hexdigest()
    members: dict[str, list] = {}
    for ref, hv in hx.items():
        members.setdefault(hv, []).append(ref)
    canon = {ref: min(members[hv]) for ref, hv in hx.items()}

    per_doc, fp_groups = {}, {}
    for doc_id, spans in docs:
        text = "\n".join(s["text"] for s in spans if s["kind"] == "text")
        trimmed = text.strip(" ")
        n_tokens = len(jws.split(trimmed))
        n_punct = sum(1 for ch in text if ch in ".,;:!?")
        pr = spark_round(n_punct / max(len(text), 1), 6)
        quality_ok = bool(n_tokens >= 5 and pr < 0.3)
        fp = _h.md5(jws.sub(" ", trimmed.lower()).encode()).hexdigest()
        media_refs = [s["media_ref"] for s in spans if s["kind"] == "media"]
        per_doc[doc_id] = (len(spans), len(media_refs),
                           sum(1 for r in media_refs if canon[r] != r),
                           n_tokens, pr, quality_ok, fp)
        fp_groups.setdefault(fp, []).append(doc_id)
    rows = []
    for doc_id, (n_spans, n_media, n_rw, n_tok, pr, q, fp) in \
            per_doc.items():
        grp = fp_groups[fp]
        is_c = doc_id == min(grp)
        rows.append((doc_id, n_spans, n_media, n_rw, n_tok, pr, q,
                     len(grp), is_c, bool(q and is_c)))
    return sorted(rows)


def q117_rows(pool: int = 5, jitter: int = 3,
              max_hamming: int = 3) -> list[tuple]:
    """Sequential twin of q117 (perceptual media keep-list): union-find
    over the q115 pair set, cluster_id = lexicographic-min member,
    keeper = (max n_bytes, min ref) per cluster, singletons kept."""
    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.analytics import multimodal as mm
    from akf_cdparser_spark.plans.queries import EXTRACT_N_DOCS

    refs = []
    for i in range(EXTRACT_N_DOCS):
        spans = fixtures.html_to_spans(fixtures.synth_html(i, EXTRACT_N_DOCS))
        refs.extend(s["media_ref"] for s in spans if s["kind"] == "media")
    info = {}
    for ref in refs:
        row = mm.synth_pooled_mixed_row(ref, pool, jitter)
        info[ref] = (row["kind"], len(row["content"]))

    parent = {r: r for r in refs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _k, _h in q115_rows(pool, jitter, max_hamming):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[str, list] = {}
    for r in refs:
        members.setdefault(find(r), []).append(r)
    rows = []
    for root, mem in members.items():
        cid = min(mem)
        keeper = min(mem, key=lambda r: (-info[r][1], r))
        for r in mem:
            rows.append((r, info[r][0], cid, len(mem), info[r][1],
                         r == keeper))
    return sorted(rows)


def q105_detail(k=8, n_iter=3, threshold=0.4):
    """Twin of analytics.clustering.semdedup rolled up per cluster: the
    q96 kmeans twin provides (vec_id, cluster_id, dist); within each
    cluster, int8 cosines (4 dp, spark_round) mark pairs >= threshold and
    the (dist DESC, vec_id ASC) keeper order removes the centroid-closer
    member. Rows: (cluster_id, n_members, n_removed, removed_vec_sum,
    kept_vec_sum). Pinned AT sf0.01 only."""
    import pyarrow.parquet as pq

    base = q96_rows(k=k, n_iter=n_iter)  # (vec_id, cluster_id, dist)
    t = pq.read_table(os.path.join(SF001, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_numpy()
    emb = np.array([np.asarray(v, dtype=np.float64)
                    for v in t.column("embedding").to_pylist()])
    order = np.argsort(vec_ids)
    vec_ids, emb = vec_ids[order], emb[order]
    s = np.abs(emb).max(axis=1)
    q = np.zeros_like(emb, dtype=np.int64)
    nz = s != 0
    q[nz] = np.floor(emb[nz] * 127.0 / s[nz][:, None]).astype(np.int64)
    qn2 = (q * q).sum(axis=1)
    pos = {int(v): i for i, v in enumerate(vec_ids)}

    by_cid: dict[int, list[tuple[int, int]]] = {}
    for vid, cid, dist in base:
        by_cid.setdefault(int(cid), []).append((int(vid), int(dist)))
    rows = []
    all_removed: set[int] = set()
    for cid in sorted(by_cid):
        members = by_cid[cid]
        removed = set()
        for vid_a, dist_a in members:
            ia = pos[vid_a]
            for vid_b, dist_b in members:
                if vid_b == vid_a:
                    continue
                ib = pos[vid_b]
                cos = spark_round(
                    float(q[ia] @ q[ib])
                    / (np.sqrt(qn2[ia]) * np.sqrt(qn2[ib])), 4)
                if cos >= threshold and (
                        dist_b > dist_a
                        or (dist_b == dist_a and vid_b < vid_a)):
                    removed.add(vid_a)
                    break
        rows.append((cid, len(members), len(removed),
                     sum(removed),
                     sum(v for v, _ in members if v not in removed)))
        all_removed.update(removed)
    return rows, sorted(all_removed)


def q105_rows(k=8, n_iter=3, threshold=0.4) -> list[tuple[int, int, int, int, int]]:
    return q105_detail(k=k, n_iter=n_iter, threshold=threshold)[0]

def q29_rows() -> list[tuple[str, int, int, int]]:
    """Sequential twin of the q29 streak grouping at sf0.01: the histogram
    comes from DuckDB running the SAME classed-elements SQL the (green) q28
    oracle uses, and the walk is the Node-vm-golden-locked port — no Spark
    anywhere."""
    import duckdb

    from akf_cdparser_spark.analytics.lse_grouping import streak_grouping
    from akf_cdparser_spark.plans.queries import Q28_SQL

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF001}/documents.parquet')")
    hist: dict[str, dict[int, int]] = {}
    for sector, cls, occ in con.execute(Q28_SQL).fetchall():
        hist.setdefault(cls, {})[int(sector)] = int(occ)
    rows = []
    for cls in sorted(hist):
        rows.extend(streak_grouping({cls: hist[cls]}))
    return sorted(rows)


def q50_rows() -> list[tuple[str, int, int, int]]:
    """Sequential twin of q50: the SAME DuckDB classed elements as q29,
    but all classes thread through ONE coupled walk in the reference's
    sectorsHolder key-insertion order — first appearance of each
    (sector, key) pair during the corpus scan (doc_id asc, element pos
    asc), derived here as min(row_number() OVER that order) per pair,
    mirroring the engine's min(struct(doc_id, pos)) aggregation."""
    import duckdb

    from akf_cdparser_spark.analytics.lse_grouping import streak_grouping
    from akf_cdparser_spark.plans.queries import _LSE_CLASSED_SQL

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF001}/documents.parquet')")
    sql = f"""
    WITH {_LSE_CLASSED_SQL},
    ranked AS (
      SELECT sector, token_class,
             row_number() OVER (ORDER BY doc_id, pos) AS rn
      FROM classed)
    SELECT sector, token_class, count(*) AS occurrences, min(rn) AS first_rn
    FROM ranked GROUP BY sector, token_class
    """
    hist: dict[str, dict[int, int]] = {}
    rank: dict[tuple, int] = {}
    for sector, cls, occ, first_rn in con.execute(sql).fetchall():
        hist.setdefault(cls, {})[int(sector)] = int(occ)
        rank[(cls, int(sector))] = int(first_rn)
    return sorted(streak_grouping(hist, insertion_rank=rank))


def q61_rows() -> list[tuple]:
    """Sequential twin of q61 (multimodal features): per doc, the media
    refs from the synthetic spans, each ref's REAL P6 payload and the
    dependency-free netpbm decode — no Spark anywhere. Feature floats go
    through float32 (the FEATURE_SCHEMA element type) before rounding so
    the literal equals the engine's stored value rounded the same way."""
    import hashlib

    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.analytics import multimodal as mm
    from akf_cdparser_spark.plans.queries import EXTRACT_N_DOCS

    rows = []
    for i in range(EXTRACT_N_DOCS):
        spans = fixtures.html_to_spans(fixtures.synth_html(i, EXTRACT_N_DOCS))
        for s in spans:
            if s["kind"] != "media":
                continue
            ref = s["media_ref"]
            payload, _w, _h = mm.synth_ppm(ref)
            feats = mm.decode_image(payload, fake=False)
            rows.append((ref, fixtures.doc_id_for(i),
                         hashlib.sha256(payload).hexdigest(), len(payload),
                         *[spark_round(float(np.float32(v)), 6)
                           for v in feats]))
    return sorted(rows)


def q62_rows() -> list[tuple]:
    """Sequential twin of q62 (audio features): same construction as
    q61_rows but through synth_wav + the dependency-free PCM16 decode."""
    import hashlib

    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.analytics import multimodal as mm
    from akf_cdparser_spark.plans.queries import EXTRACT_N_DOCS

    rows = []
    for i in range(EXTRACT_N_DOCS):
        spans = fixtures.html_to_spans(fixtures.synth_html(i, EXTRACT_N_DOCS))
        for s in spans:
            if s["kind"] != "media":
                continue
            ref = s["media_ref"]
            payload, _r, _n = mm.synth_wav(ref)
            feats = mm.decode_audio(payload, fake=False)
            rows.append((ref, fixtures.doc_id_for(i),
                         hashlib.sha256(payload).hexdigest(), len(payload),
                         *[spark_round(float(np.float32(v)), 6)
                           for v in feats]))
    return sorted(rows)


def q63_rows() -> list[tuple]:
    """Sequential twin of q63 (video features): synth_y4m + the
    dependency-free frame-sampling decode."""
    import hashlib

    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.analytics import multimodal as mm
    from akf_cdparser_spark.plans.queries import EXTRACT_N_DOCS

    rows = []
    for i in range(EXTRACT_N_DOCS):
        spans = fixtures.html_to_spans(fixtures.synth_html(i, EXTRACT_N_DOCS))
        for s in spans:
            if s["kind"] != "media":
                continue
            ref = s["media_ref"]
            payload, _w, _h, _n = mm.synth_y4m(ref)
            feats = mm.decode_video(payload, fake=False)
            rows.append((ref, fixtures.doc_id_for(i),
                         hashlib.sha256(payload).hexdigest(), len(payload),
                         *[spark_round(float(np.float32(v)), 6)
                           for v in feats]))
    return sorted(rows)


def q94_rows(n_merges: int = 12) -> list[tuple[int, str, str, int]]:
    """Pure-Python BPE twin of ``analytics.bpe.learn_bpe`` over the sf0.01
    documents: whitespace word vocabulary, character start symbols (no
    end-of-word marker — the engine's documented deviation), integer pair
    counts, (count DESC, left ASC, right ASC) tie-break, greedy
    leftmost-first merge application. Independent of any Spark code."""
    import duckdb

    con = duckdb.connect()
    words = con.execute(
        f"SELECT w, count(*) FROM (SELECT UNNEST(regexp_split_to_array("
        f"trim(text), '\\s+')) AS w FROM read_parquet("
        f"'{SF001}/documents.parquet')) WHERE length(w) > 0 GROUP BY w"
    ).fetchall()
    vocab = {tuple(w): c for w, c in words}
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (l, r), pc = min(counts.items(),
                         key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, l, r, pc))
        merged = l + r
        nxt: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = merged
                else:
                    out.append(x)
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


HEADER = '''"""GENERATED by scripts/gen_pinned_oracles.py — do not edit.

Pinned expected tables for the q29/q47/q48/q50/q61-q63/q65/q94/q96/q97/q101/q105 oracles, computed
through sequential non-Spark twins (local kernel / DuckDB+walk / numpy LSH /
numpy IVF / pure-Python media decoders). See the generator's docstring for
the independence argument; tests/test_pinned_oracles.py is the drift gate.
Q29/Q48/Q50/Q65/Q94/Q96/Q97/Q101/Q105 values are valid for the sf0.01 tables only.
"""

'''


def q96_rows(k: int = 8, n_iter: int = 3) -> list[tuple[int, int, int]]:
    """Numpy twin of ``analytics.clustering.kmeans_int8`` over the sf0.01
    embeddings: floor int8 quantization, md5-rank init, integer squared-L2
    assignment with (dist, cid) tie-break, floor(sum/count) centroid
    updates, empty clusters keep their centroid."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet("
        f"'{SF001}/embeddings.parquet') ORDER BY vec_id").fetchall()
    ids = [int(v) for v, _ in rows]
    vecs = np.array([list(e) for _, e in rows], dtype=np.float64)
    s = np.abs(vecs).max(axis=1)
    q = np.zeros_like(vecs, dtype=np.int64)
    nz = s != 0
    q[nz] = np.floor(vecs[nz] * 127.0 / s[nz][:, None]).astype(np.int64)

    order = sorted(range(len(ids)),
                   key=lambda i: (hashlib.md5(str(ids[i]).encode())
                                  .hexdigest(), ids[i]))
    cents = [q[order[c]].copy() for c in range(k)]

    def assign():
        out = []
        for i in range(len(ids)):
            best = min(((int(((q[i] - c) ** 2).sum()), cid)
                        for cid, c in enumerate(cents)))
            out.append(best)
        return out

    for _ in range(n_iter):
        a = assign()
        for cid in range(k):
            members = [i for i, (_d, c) in enumerate(a) if c == cid]
            if members:
                sums = q[members].sum(axis=0)
                cents[cid] = np.array([int(x) // len(members)
                                       for x in sums], dtype=np.int64)
    final = assign()
    return [(ids[i], int(final[i][1]), int(final[i][0]))
            for i in range(len(ids))]


def q97_rows(n_merges: int = 12) -> list[tuple[str, int, int, int]]:
    """Twin of learn_bpe(sf0.01)+apply_bpe rolled up per language:
    (lang, n_docs, total_tokens, total_distinct_tokens)."""
    import duckdb

    merges = [(l, r) for _s, l, r, _c in q94_rows(n_merges)]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM read_parquet("
        f"'{SF001}/documents.parquet')").fetchall()

    def apply(word: str) -> list[str]:
        out = list(word)
        for l, r in merges:
            nxt: list[str] = []
            for x in out:
                if nxt and nxt[-1] == l and x == r:
                    nxt[-1] = l + r
                else:
                    nxt.append(x)
            out = nxt
        return out

    per_lang: dict[str, list[int]] = {}
    cache: dict[str, list[str]] = {}
    for _doc_id, lang, text in rows:
        toks: list[str] = []
        for w in text.split():
            if w not in cache:
                cache[w] = apply(w)
            toks.extend(cache[w])
        agg = per_lang.setdefault(lang, [0, 0, 0])
        agg[0] += 1
        agg[1] += len(toks)
        agg[2] += len(set(toks))
    return [(lang, a[0], a[1], a[2])
            for lang, a in sorted(per_lang.items())]


def main():
    q47 = q47_rows()
    q48 = q48_rows()
    q65 = q65_rows()
    q101 = q101_rows()
    q110 = q110_rows()
    q112 = q112_rows()
    q113 = q113_rows()
    q114 = q114_rows()
    q115 = q115_rows()
    q116 = q116_rows()
    q117 = q117_rows()
    q105, q105_removed = q105_detail()
    q29 = q29_rows()
    q50 = q50_rows()
    q61 = q61_rows()
    q62 = q62_rows()
    q63 = q63_rows()
    q94 = q94_rows()
    q96 = q96_rows()
    q97 = q97_rows()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "akf_cdparser_spark", "plans", "pinned.py")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(HEADER)
        fh.write("Q29_EXPECTED = [\n")
        for r in q29:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ50_EXPECTED = [\n")
        for r in q50:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ47_EXPECTED = [\n")
        for r in q47:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ48_EXPECTED = [\n")
        for r in q48:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ65_EXPECTED = [\n")
        for r in q65:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ101_EXPECTED = [\n")
        for r in q101:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ110_EXPECTED = [\n")
        for r in q110:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ112_EXPECTED = [\n")
        for r in q112:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ113_EXPECTED = [\n")
        for r in q113:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ114_EXPECTED = [\n")
        for r in q114:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ115_EXPECTED = [\n")
        for r in q115:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ116_EXPECTED = [\n")
        for r in q116:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ117_EXPECTED = [\n")
        for r in q117:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ105_EXPECTED = [\n")
        for r in q105:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\n# semdedup(k=8) removed vec_ids at sf0.01 — the"
                 "\n# semantic-dedup prepass of the q108 composed-curation"
                 " oracle\nQ105_REMOVED = [\n")
        for r in q105_removed:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ61_EXPECTED = [\n")
        for r in q61:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ62_EXPECTED = [\n")
        for r in q62:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ63_EXPECTED = [\n")
        for r in q63:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ94_EXPECTED = [\n")
        for r in q94:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ96_EXPECTED = [\n")
        for r in q96:
            fh.write(f"    {r!r},\n")
        fh.write("]\n\nQ97_EXPECTED = [\n")
        for r in q97:
            fh.write(f"    {r!r},\n")
        fh.write("]\n")
    print(f"wrote {path}: {len(q29)} q29, {len(q50)} q50, "
          f"{len(q47)} q47, {len(q48)} q48, {len(q65)} q65, "
          f"{len(q61)} q61, {len(q62)} q62, {len(q63)} q63 rows")
    print("q48:", q48)
    print("q65:", q65)
    print("q101:", q101)
    print("q110:", q110)
    print("q112:", q112)
    print("q113:", len(q113), "rows,",
          len({h for _, _, h, _, _ in q113}), "unique payloads")
    print("q114:", len(q114), "near-dup pairs")
    print("q115:", len(q115), "cross-modal near-dup pairs")
    print("q116:", len(q116), "docs,",
          sum(1 for r in q116 if r[9]), "kept")
    print("q117:", len(q117), "media rows,",
          sum(1 for r in q117 if r[5]), "kept")
    print("q105:", q105)


if __name__ == "__main__":
    main()
