#!/usr/bin/env python3
"""Independent reference implementations for the signature-family
operators (MinHash/LSH, SimHash, winnowing, sign-LSH embedding dedup),
used to derive the VALUES-golden oracles for x03/x05/x06/x17 and the
candidate pair lists embedded in the x04 oracle.

Everything here is re-derived from PUBLIC algorithm specifications —
java.util.Random's LCG (JDK javadoc), FNV-1a 64 (Fowler/Noll/Vo),
the splitmix64 finalizer (Steele et al., JDK SplittableRandom), the
MurmurHash3 fmix64 avalanche, and xxHash64 (Cyan4973's published
spec) — NOT translated from the Scala operators. Agreement between
this script and the Spark output is therefore a genuine
two-independent-implementations check of the same public algorithms.

Usage: python3 tools/golden_ext.py /root/testdata/sf0.01 tools/goldens
"""
import sys, os, re, struct

M64 = (1 << 64) - 1


# --- java.util.Random (LCG per JDK spec) ------------------------------
class JavaRandom:
    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        r = self.seed >> (48 - bits)
        # sign-extend to a signed 32-bit int
        if r >= 1 << 31:
            r -= 1 << 32
        return r

    def next_long(self):
        hi = self._next(32)
        lo = self._next(32)
        v = (hi << 32) + lo
        return v  # python int; callers mask to 64 bits as needed

    def next_boolean(self):
        return self._next(1) != 0


# --- splitmix64 finalizer --------------------------------------------
def signed64(v):
    """The engine compares hash values as SIGNED 64-bit longs (JVM
    semantics); min/ordering below must match."""
    return v - (1 << 64) if v >= (1 << 63) else v


def mix64(z):
    z &= M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


# --- FNV-1a 64 over UTF-16 code units + murmur fmix64 avalanche -------
def fnv_avalanche(s, i, k):
    h = 0xCBF29CE484222325
    for j in range(i, min(len(s), i + k)):
        h = ((h ^ ord(s[j])) * 0x100000001B3) & M64
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & M64
    h ^= h >> 33
    return h


def shingle_hashes(raw, k):
    s = raw.strip().lower()
    n = max(1, len(s) - k + 1)
    return [fnv_avalanche(s, i, k) for i in range(n)]


# --- MinHash ----------------------------------------------------------
def minhash_seeds(num_hashes):
    rnd = JavaRandom(42)
    return [rnd.next_long() & M64 for _ in range(num_hashes)]


def minhash_signature(hs, seeds):
    sig = []
    for sd in seeds:
        m = min(signed64(mix64(h ^ sd)) for h in hs) if hs else (1 << 63) - 1
        sig.append(m)
    return sig


def minhash_candidates(docs, num_hashes=64, bands=16, k=5):
    """docs: list of (id, text). Returns {(a,b): est_jaccard} for pairs
    sharing >=1 band (bands compared by slice equality; the engine's
    xxhash64 bucket key only collides with ~2^-64 probability)."""
    seeds = minhash_seeds(num_hashes)
    rows = num_hashes // bands
    sigs = {i: minhash_signature(shingle_hashes(t, k), seeds) for i, t in docs}
    buckets = {}
    for i, sig in sigs.items():
        for b in range(bands):
            key = (b, tuple(sig[b * rows:(b + 1) * rows]))
            buckets.setdefault(key, []).append(i)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    out = {}
    for a, b in sorted(pairs):
        eq = sum(1 for u, v in zip(sigs[a], sigs[b]) if u == v)
        out[(a, b)] = eq / num_hashes
    return out


# --- xxHash64 (public spec, seed passed by caller) --------------------
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def xxh64(data, seed):
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= n:
            for vi, off in ((1, 0), (2, 8), (3, 16), (4, 24)):
                lane = struct.unpack_from('<Q', data, i + off)[0]
                v = (v1, v2, v3, v4)[vi - 1]
                v = (v + lane * P2) & M64
                v = (_rotl(v, 31) * P1) & M64
                if vi == 1: v1 = v
                elif vi == 2: v2 = v
                elif vi == 3: v3 = v
                else: v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            # mergeRound: h ^= round(0, v); h = h*P1 + P4
            v = (_rotl((v * P2) & M64, 31) * P1) & M64
            h = ((h ^ v) * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        lane = struct.unpack_from('<Q', data, i)[0]
        k = (_rotl((lane * P2) & M64, 31) * P1) & M64
        h = ((_rotl(h ^ k, 27) * P1) + P4) & M64
        i += 8
    if i + 4 <= n:
        lane = struct.unpack_from('<I', data, i)[0]
        h = ((_rotl(h ^ ((lane * P1) & M64), 23) * P2) + P3) & M64
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * P5) & M64), 11) * P1) & M64)
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64_str(s, seed=42):
    return xxh64(s.encode('utf-8'), seed)


# --- SimHash ----------------------------------------------------------
def simhash(text):
    toks = re.split(r'\s+', text.strip().lower())
    acc = [0] * 64
    for t in toks:
        h = xxh64_str(t)
        for j in range(64):
            acc[j] += 1 if (h >> j) & 1 else -1
    sig = 0
    for j in range(64):
        if acc[j] > 0:
            sig |= 1 << j
    return sig


def simhash_pairs(docs, max_hamming=3):
    """Block trick is exact for hamming<=3 over 4x16-bit blocks
    (pigeonhole), so candidates == all pairs at hamming<=maxHamming."""
    sigs = {i: simhash(t) for i, t in docs}
    ids = sorted(sigs)
    out = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ham = bin(sigs[a] ^ sigs[b]).count('1')
            if ham <= max_hamming:
                # block-trick candidacy: must share >=1 16-bit block
                shares = any(((sigs[a] >> (16 * blk)) & 0xFFFF) ==
                             ((sigs[b] >> (16 * blk)) & 0xFFFF)
                             for blk in range(4))
                assert shares, "hamming<=3 pair must share a block"
                out.append((a, b, ham))
    return out


# --- Winnowing --------------------------------------------------------
def winnowing_fps(text, k=8, w=4):
    s = text.strip().lower()
    n = max(1, len(s) - k + 1)
    hs = [signed64(fnv_avalanche(s, i, k)) for i in range(n)]
    out = []
    seen = set()
    for start in range(0, n - min(w, n) + 1):
        m = min(hs[start:start + w])
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


def five_grams(t):
    """Raw character 5-grams of lower(trim(text)) — the gramsCte the
    DuckDB oracles build (substr(s, i, 5) for i in 1..max(len-4, 1),
    deduped)."""
    s = t.strip().lower()
    return {s[i - 1:i + 4] for i in range(1, max(len(s) - 3, 2))}


def brute_recall_verify(docs, cands, max_docs=600, sample_n=2000):
    """Second, fully INDEPENDENT recall leg (r17 verdict task 5): a
    from-scratch all-pairs enumeration with its own shingler and plain
    set Jaccard — shares NO helper with minhash_candidates or the
    matrix-based audit above (five_grams / shingle_hashes / numpy all
    unused), so a definition bug common to the mirror's shared helpers
    cannot forgive itself. Pure-python set sweep: below max_docs the
    WHOLE corpus is enumerated (sf0.001 and the committed-golden
    sf0.01 are both ~500 docs = ~125k pairs, < 3 s).

    r19 (r18 verdict task 3): past max_docs the leg no longer
    disappears — it runs on a deterministic content-independent SAMPLE
    of sample_n docs, selected by md5 of the doc id (a hash no
    candidate-generation path uses, so the selection cannot correlate
    with what banding found or missed). True pairs wholly inside the
    sample are verified exactly as before; the record reports the
    sample size and in-sample true-pair count so a vacuous run (no
    true pairs sampled) is visible in the audit line rather than
    silently green. Cost is O(sample_n^2) regardless of corpus size
    (~45 s at 2000). Exits nonzero on a missed pair (explicit exit,
    never assert — must survive python3 -O)."""
    label = f"n={len(docs)}"
    if len(docs) > max_docs:
        import hashlib
        docs = sorted(
            sorted(docs, key=lambda it: hashlib.md5(
                str(it[0]).encode()).hexdigest())[:sample_n],
            key=lambda it: it[0])
        label = f"sample {len(docs)} of {label}"
    # deliberately re-derived from the DEFINITION (lowercased stripped
    # text, character 5-grams, whole string when shorter than 5):
    def grams(t):
        s = t.strip().lower()
        return {s[j:j + 5] for j in range(max(len(s) - 4, 1))}
    g = [(i, grams(t)) for i, t in docs]
    missed = []
    true_pairs = 0
    for x in range(len(g)):
        ia, ga = g[x]
        for y in range(x + 1, len(g)):
            ib, gb = g[y]
            un = len(ga | gb)
            j = (len(ga & gb) / un) if un else 0.0
            if j >= 0.8:
                true_pairs += 1
                a, b = (ia, ib) if ia <= ib else (ib, ia)
                if cands.get((a, b), 0.0) < 0.65:
                    missed.append((a, b, j))
    if missed:
        sys.exit(f"brute recall verify: banded candidates MISSED true "
                 f">=0.8 pairs (independent enumeration): {missed[:5]}")
    return (f"brute-verified at {label} "
            f"({len(g) * (len(g) - 1) // 2} pairs, {true_pairs} true)")


def brute_selftest():
    """The brute leg's FAILURE path, exercised before every real run: a
    planted near-dup pair against an empty candidate map must exit
    nonzero. A recall gate whose miss branch never executes is itself
    unverified (the same principle as GRAFT_AUDIT_FLOP_CAP=1 for the
    matrix audit)."""
    planted = [(1, "the quick brown fox jumps over the lazy dog " * 20),
               (2, "the quick brown fox jumps over the lazy dog " * 20 +
                   "tail"),
               (3, "completely unrelated content about spark engines")]
    try:
        brute_recall_verify(planted, cands={})
    except SystemExit:
        return "brute selftest: miss branch fires"
    sys.exit("brute recall verify SELFTEST FAILED: a planted >=0.8 pair "
             "with an empty candidate list did not trip the miss exit — "
             "the leg would silently forgive every engine recall loss")


def recall_audit(docs, cands, flop_cap=5e11, allow_skip=False):
    """Generation-time recall guarantee for the candidate-restricted
    verified-edge oracles (x14/x16/x25/x77): every TRUE all-pairs raw
    5-gram Jaccard >= 0.8 pair must be a banded MinHash candidate at
    est >= 0.65, or restricting the oracle's exact-Jaccard recompute to
    the candidate list would silently forgive an engine recall loss.

    All-pairs ground truth computed as a dense boolean gram-incidence
    matrix product (|A ∩ B| = M · Mᵀ — BLAS makes 5000 docs × ~2k grams
    a few seconds where the pure-python set sweep took hours), then
    pairs NEAR the threshold re-checked with exact integer set
    arithmetic so float32 rounding can neither include nor exclude a
    borderline pair.

    FAIL-CLOSED: past flop_cap (2·n²·m) the audit EXITS NONZERO unless
    --allow-audit-skip was passed explicitly — a green golden run must
    imply the banding-recall guarantee actually ran, never that it was
    quietly too expensive. Returns the one-line audit record that main()
    writes to <outdir>/recall_audit.txt for the verify record."""
    import numpy as np
    g = {i: five_grams(t) for i, t in docs}
    vocab = {}
    for s in g.values():
        for gr in s:
            vocab.setdefault(gr, len(vocab))
    n, m = len(g), len(vocab)
    if 2.0 * n * n * m > flop_cap:
        rec = (f"skipped n={n} grams={m} flops={2.0 * n * n * m:.2e} "
               f"cap={flop_cap:.2e}")
        if not allow_skip:
            sys.exit(f"recall audit: REFUSING to skip ({rec}). The "
                     "x14/x16/x25/x77 candidate-restricted oracles depend "
                     "on this guarantee; pass --allow-audit-skip only if "
                     "you will verify banding recall by other means.")
        print(f"recall audit: {rec} (--allow-audit-skip)")
        return rec
    ids = sorted(g)
    M = np.zeros((n, m), dtype=np.float32)
    for r, i in enumerate(ids):
        for gr in g[i]:
            M[r, vocab[gr]] = 1.0
    inter = M @ M.T                      # counts <= m << 2^24: exact in f32
    sizes = M.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(divide='ignore', invalid='ignore'):
        J = np.where(union > 0, inter / union, 0.0)
    # conservative f32 screen, exact integer decision per survivor
    xs, ys = np.where(np.triu(J, k=1) >= 0.79)
    true_pairs, missed = [], []
    for x, y in zip(xs.tolist(), ys.tolist()):
        a, b = ids[x], ids[y]
        un = len(g[a] | g[b])
        j = (len(g[a] & g[b]) / un) if un else 0.0
        if j >= 0.8:
            true_pairs.append((a, b))
            if cands.get((a, b), 0.0) < 0.65:
                missed.append((a, b, j))
    # explicit exit, not `assert` — the gate must survive python3 -O /
    # PYTHONOPTIMIZE, which strips asserts and would turn a recall loss
    # into an "ok" record
    if missed:
        sys.exit(f"recall audit: banded candidates MISSED true >=0.8 "
                 f"pairs: {missed[:5]}")
    rec = (f"ok {len(true_pairs)} true jaccard>=0.8 pairs, all are "
           f"candidates at est>=0.65 (n={n}, grams={m})")
    print(f"recall audit: {rec}")
    return rec


def winnow_fixtures():
    """Two fixture docs sharing one long non-repetitive window —
    mirrored character-for-character in ExtQueries.winnowFixtures so
    the x17 golden stays non-vacuous at scales where the synthetic
    corpus has no natural collision pairs (sf0.1)."""
    core = ''.join(' ' if i % 7 == 6 else chr(ord('a') + (i * i * 31 + i * 7) % 26)
                   for i in range(3000))
    return [(-2, "alpha fixture prologue " + core),
            (-1, "omega fixture prologue " + core + " epilogue")]


def winnowing_pairs(docs, max_df=20, min_shared=25):
    fps = {i: set(winnowing_fps(t)) for i, t in docs}
    df = {}
    for s in fps.values():
        for f in s:
            df[f] = df.get(f, 0) + 1
    rare = {f for f, c in df.items() if c <= max_df}
    inv = {}
    for i, s in fps.items():
        for f in s & rare:
            inv.setdefault(f, []).append(i)
    shared = {}
    for ids in inv.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                p = (ids[x], ids[y])
                shared[p] = shared.get(p, 0) + 1
    return sorted((a, b, c) for (a, b), c in shared.items() if c >= min_shared)


# --- ANN: sign-LSH probe top-k (x08) ---------------------------------
def cosine_f32(a, b):
    """VecOps.cosine: sequential double accumulation of exact f32
    products, then ab / (sqrt(aa)*sqrt(bb))."""
    ab = aa = bb = 0.0
    for x, y in zip(a, b):
        x = float(x); y = float(y)
        ab += x * y; aa += x * x; bb += y * y
    d = (aa ** 0.5) * (bb ** 0.5)
    return 0.0 if d == 0.0 else ab / d


def lsh_topk(vecs, query, k, dim, sign_bits=8, probe_hamming=1):
    planes = rademacher_planes(sign_bits, dim)

    def sig_of(v):
        sig = 0
        for b in range(sign_bits):
            s = 0.0
            for i in range(min(dim, len(v))):
                s += planes[b][i] * float(v[i])
            if s > 0:
                sig |= 1 << b
        return sig

    qsig = sig_of(query)
    scored = []
    for vid, v in vecs:
        if bin(sig_of(v) ^ qsig).count('1') <= probe_hamming:
            scored.append((vid, cosine_f32(v, query)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


# --- sign-LSH embedding near-dup (Rademacher planes) ------------------
def rademacher_planes(sign_bits, dim):
    """planes[b][i] = +1/-1 from JavaRandom(42).nextBoolean(), row-major
    (the fill order of Array.fill(signBits, dim))."""
    rnd = JavaRandom(42)
    return [[1.0 if rnd.next_boolean() else -1.0 for _ in range(dim)]
            for _ in range(sign_bits)]


def embedding_neardup(vecs, threshold, dim, sign_bits, num_tables=1):
    """vecs: list of (id, list-of-float32-as-python-floats). Float
    arithmetic reproduced exactly: f32*f32 products are exact in f64;
    additions follow the engine's sequential order. num_tables > 1 is
    the banded variant: table t uses planes [t*sign_bits, (t+1)*sign_bits)
    of one seed-42 sequence; candidates share ANY table's bucket."""
    import numpy as np
    planes = rademacher_planes(num_tables * sign_bits, dim)
    ids = [i for i, _ in vecs]
    V = np.array([v for _, v in vecs], dtype=np.float32)
    # bucket per table: sign of sequential double dot with +-1 planes
    sigs = []  # sigs[r] = list of num_tables bucket ids
    for r in range(len(ids)):
        row = []
        for t in range(num_tables):
            sig = 0
            for b in range(sign_bits):
                s = 0.0
                for i in range(min(dim, V.shape[1])):
                    s += planes[t * sign_bits + b][i] * float(V[r, i])
                if s > 0:
                    sig |= 1 << b
            row.append(sig)
        sigs.append(row)
    # normalize: double sum of squares -> sqrt -> f32(v/norm)
    N = np.empty_like(V)
    for r in range(len(ids)):
        s = 0.0
        for i in range(V.shape[1]):
            s += float(V[r, i]) * float(V[r, i])
        norm = s ** 0.5
        if norm == 0.0:
            N[r] = V[r]
        else:
            N[r] = (V[r].astype(np.float64) / norm).astype(np.float32)
    cand = set()
    for t in range(num_tables):
        by_bucket = {}
        for r, row in enumerate(sigs):
            by_bucket.setdefault(row[t], []).append(r)
        for rows in by_bucket.values():
            for x in range(len(rows)):
                for y in range(len(rows)):
                    ra, rb = rows[x], rows[y]
                    if ids[ra] < ids[rb]:
                        cand.add((ra, rb))
    out = []
    for ra, rb in cand:
        s = 0.0
        for i in range(V.shape[1]):
            s += float(N[ra, i]) * float(N[rb, i])
        if s >= threshold:
            out.append((ids[ra], ids[rb], s))
    return sorted(set(out))


# --- main: emit golden TSVs ------------------------------------------
# --- product quantization (x47/x48) -----------------------------------
def _dist2(a, b):
    s = 0.0
    for x, y in zip(a, b):
        d = x - y
        s += d * d
    return s


def pq_topk(vecs, query, k=10, dim=64, m=8, codewords=16, iters=3, train_n=256):
    """Similarity.pqTrain/pqEncode/pqTopK, op-for-op: codebook j trains
    on subvectors [j*dsub,(j+1)*dsub) of the first train_n vectors in
    vec_id order (deterministic k-means: _kmeans_codebook). ADC = sum
    over subspaces of the query-to-codeword squared L2; ascending,
    vec_id tiebreak. All ops in f64 with identical order, so results
    repr-round-trip exactly. (The engine zero-pads ragged vectors; the
    test corpus has none.)"""
    dsub = dim // m
    sample = [[float(x) for x in v] for _, v in vecs[:train_n]]
    codebooks = [
        _kmeans_codebook([v[j * dsub:(j + 1) * dsub] for v in sample],
                         codewords, iters)
        for j in range(m)]
    q = [float(x) for x in query]
    tab = [[_dist2(q[j * dsub:(j + 1) * dsub], codebooks[j][c])
            for c in range(codewords)] for j in range(m)]
    scored = []
    for vid, v in vecs:
        vv = [float(t) for t in v]
        s = 0.0
        for j in range(m):
            s += tab[j][_nearest(vv[j * dsub:(j + 1) * dsub], codebooks[j])]
        scored.append((vid, s))
    scored.sort(key=lambda t: (t[1], t[0]))
    return scored[:k]


def semdedup(vecs, tau, n_cells=16, iters=3, train_n=256):
    """Dedup.semDedup, op-for-op: deterministic k-means over the first
    train_n vectors (full dim), strict-< argmin cell assignment, then
    drop a row iff some same-cell row with a LOWER id has
    cosine_f32 >= tau to it. Returns (vec_id, cell, kept) by vec_id."""
    sample = [[float(x) for x in v] for _, v in vecs[:train_n]]
    cb = _kmeans_codebook(sample, n_cells, iters)
    by_cell = {}
    for vid, v in vecs:
        c = _nearest([float(x) for x in v], cb)
        by_cell.setdefault(c, []).append((vid, v))
    out = []
    for c, rows in by_cell.items():
        for i, (b_id, b) in enumerate(rows):
            dropped = any(cosine_f32(a, b) >= tau for _, a in rows[:i])
            out.append((b_id, c, not dropped))
    out.sort()
    return out


def _kmeans_codebook(subs, k, iters):
    """Similarity.kmeansCodebook, op-for-op: init = first k samples,
    strict-< argmin (lowest index wins), means accumulated in sample
    order, empty clusters keep their centroid."""
    dsub = len(subs[0])
    cb = [list(subs[c]) for c in range(k)]
    for _ in range(iters):
        sums = [[0.0] * dsub for _ in range(k)]
        counts = [0] * k
        for x in subs:
            best, bestd = 0, _dist2(x, cb[0])
            for c in range(1, k):
                dd = _dist2(x, cb[c])
                if dd < bestd:
                    best, bestd = c, dd
            counts[best] += 1
            for d in range(dsub):
                sums[best][d] += x[d]
        cb = [[sums[c][d] / counts[c] for d in range(dsub)]
              if counts[c] > 0 else cb[c] for c in range(k)]
    return cb


def _nearest(x, cands):
    best, bestd = 0, _dist2(x, cands[0])
    for c in range(1, len(cands)):
        dd = _dist2(x, cands[c])
        if dd < bestd:
            best, bestd = c, dd
    return best


def ivfpq_topk(vecs, query, k=10, dim=64, n_cells=8, m=8, codewords=16,
               iters=3, train_n=256, nprobe=2):
    """Similarity.ivfPqTrain/ivfPqEncode/ivfPqTopK, op-for-op: coarse
    deterministic k-means over the first train_n vectors, residual PQ
    codebooks, probe the nprobe cells nearest the query (ordered by
    (distance, cell)), ADC against the per-cell query residual."""
    dsub = dim // m
    sample = [[float(x) for x in v] for _, v in vecs[:train_n]]
    coarse = _kmeans_codebook(sample, n_cells, iters)
    residuals = []
    for x in sample:
        cell = _nearest(x, coarse)
        residuals.append([x[d] - coarse[cell][d] for d in range(dim)])
    codebooks = [
        _kmeans_codebook([r[j * dsub:(j + 1) * dsub] for r in residuals],
                         codewords, iters)
        for j in range(m)]

    q = [float(x) for x in query]
    probed = sorted(((_dist2(q, coarse[c]), c) for c in range(n_cells)))[:nprobe]
    probed = [c for _, c in probed]
    tabs = {}
    for cell in probed:
        qr = [q[d] - coarse[cell][d] for d in range(dim)]
        tabs[cell] = [[_dist2(qr[j * dsub:(j + 1) * dsub], codebooks[j][c])
                       for c in range(codewords)] for j in range(m)]
    scored = []
    for vid, v in vecs:
        x = [float(t) for t in v]
        cell = _nearest(x, coarse)
        if cell not in tabs:
            continue
        s = 0.0
        for j in range(m):
            r = [x[j * dsub + d] - coarse[cell][j * dsub + d] for d in range(dsub)]
            s += tabs[cell][j][_nearest(r, codebooks[j])]
        scored.append((vid, s))
    scored.sort(key=lambda t: (t[1], t[0]))
    return scored[:k]


def main():
    args = [a for a in sys.argv[1:] if a != '--allow-audit-skip']
    allow_skip = '--allow-audit-skip' in sys.argv[1:]
    sfdir, outdir = args[0], args[1]
    os.makedirs(outdir, exist_ok=True)
    import duckdb
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sfdir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    embs = con.execute(
        f"SELECT vec_id, embedding FROM '{sfdir}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()

    def write(name, rows, fmt):
        with open(os.path.join(outdir, name), 'w') as f:
            for r in rows:
                f.write(fmt(r) + '\n')
        print(f"{name}: {len(rows)} rows")

    cands = minhash_candidates(docs)
    # GRAFT_AUDIT_FLOP_CAP: operator tunable (bigger box, bigger cap) and
    # the hook that lets the reverify gate's FAILURE path be exercised
    # end-to-end (set it to 1 and the run must die unless explicitly
    # allowed to skip) — a gate whose failure mode is never executed is
    # itself unverified.
    flop_cap = float(os.environ.get('GRAFT_AUDIT_FLOP_CAP', 5e11))
    audit_rec = recall_audit(docs, cands, flop_cap=flop_cap,
                             allow_skip=allow_skip)
    # the independent brute leg (no shared helpers): whole-corpus below
    # ~600 docs, a deterministic 2k md5-sample above (r19); its miss
    # branch is self-tested first, and its record rides in the same line
    print(f"recall audit: {brute_selftest()}")
    brute_rec = brute_recall_verify(docs, cands)
    if brute_rec:
        audit_rec = f"{audit_rec}; {brute_rec}"
        print(f"recall audit: {brute_rec}")
    with open(os.path.join(outdir, 'recall_audit.txt'), 'w') as f:
        f.write(f"{os.path.basename(sfdir.rstrip('/'))}: {audit_rec}\n")
    # x03: est_jaccard >= 0.5; doubles are k/64 so repr() round-trips
    write('x03_minhash_neardup.tsv',
          [(a, b, e) for (a, b), e in sorted(cands.items()) if e >= 0.5],
          lambda r: f"{r[0]}\t{r[1]}\t{r[2]!r}")
    # x04 pair list (same filter; jaccard recomputed by DuckDB from raw
    # 5-grams in the oracle SQL itself)
    write('x05_simhash.tsv', simhash_pairs(docs),
          lambda r: f"{r[0]}\t{r[1]}\t{r[2]}")
    write('x17_winnowing.tsv', winnowing_pairs(docs + winnow_fixtures()),
          lambda r: f"{r[0]}\t{r[1]}\t{r[2]}")
    write('x06_embedding_neardup.tsv',
          embedding_neardup(embs, threshold=0.3, dim=64, sign_bits=2),
          lambda r: f"{r[0]}\t{r[1]}\t{r[2]!r}")
    # banded variant (x35): longer signatures for near-linear Σ bucket²,
    # multiple tables to buy the recall back
    write('x35_embedding_neardup_banded.tsv',
          embedding_neardup(embs, threshold=0.3, dim=64, sign_bits=6,
                            num_tables=4),
          lambda r: f"{r[0]}\t{r[1]}\t{r[2]!r}")
    import math
    import numpy as np
    query = [float(np.float32(math.sin(i + 1))) for i in range(64)]
    write('x08_ann_lsh.tsv', lsh_topk(embs, query, k=10, dim=64),
          lambda r: f"{r[0]}\t{r[1]!r}")
    write('x47_ann_pq.tsv', pq_topk(embs, query, k=10, dim=64),
          lambda r: f"{r[0]}\t{r[1]!r}")
    write('x48_ann_ivfpq.tsv', ivfpq_topk(embs, query, k=10, dim=64),
          lambda r: f"{r[0]}\t{r[1]!r}")
    # x70: tau pinned at 0.3 for the synthetic corpus (same choice as
    # x06 — the generator plants no >0.5-cosine pairs)
    write('x70_semdedup.tsv', semdedup(embs, tau=0.3),
          lambda r: f"{r[0]}\t{r[1]}\t{str(r[2]).lower()}")


if __name__ == '__main__':
    main()
