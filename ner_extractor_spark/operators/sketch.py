"""Deterministic, engine-portable sketches over a token stream (build
brief: custom operators Spark lacks — 'a novel sketch' — expressed as
pure aggregations): a count-min sketch and a Bloom filter.

A CMS is ``depth`` hash rows × ``width`` counters; an item's estimate is
the MIN of its counters, an upper bound on the true count with error
≤ εN at probability 1-δ (ε = e/width, δ = e^-depth; Cormode &
Muthukrishnan 2005).  This implementation is DETERMINISTIC and
engine-portable: row r's hash of token t is the first 4 hex chars of
md5("r|t") folded to an int, mod width (width must divide 65536 so the
fold stays uniform) — so the DuckDB oracle rebuilds the identical
sketch cell for cell, which pseudo-random-seeded sketch libraries
(e.g. Spark's own ``count_min_sketch`` function) cannot offer across
engines.

Shapes: building = one explode + one groupBy((row, cell)) — the sketch
is depth×width rows regardless of corpus size (the whole point: a
bounded summary of an unbounded stream, mergeable across partitions /
days by cell-wise addition).  Querying = a broadcast join of the query
terms against depth×|terms| cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEPTH = 4
WIDTH = 1024


def _cell(token_col, row: int, width: int):
    h = F.md5(F.concat(F.lit(f"{row}|"), token_col))
    return F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("int"),
                  F.lit(width))


def build_cms(tokens: DataFrame, token_col: str = "token",
              depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """token rows -> (row, cell, n) sketch table (depth×width max rows).
    Mergeable: union two sketches and re-sum on (row, cell)."""
    if 65536 % width:
        raise ValueError("width must divide 65536 (4-hex-char hash fold)")
    # single pass: each token explodes into its depth (row, cell) pairs
    # in one projection — a per-row union would rescan the (possibly
    # expensive) upstream token pipeline depth times
    cells = F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _cell(F.col(token_col), r, width).alias("cell"))
        for r in range(depth)])).alias("rc")
    return (tokens.select(cells)
            .groupBy(F.col("rc.row").alias("row"),
                     F.col("rc.cell").alias("cell"))
            .agg(F.count(F.lit(1)).alias("n")))


def cms_estimate(cms: DataFrame, terms: DataFrame,
                 term_col: str = "term",
                 depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """(term) rows -> (term, est): est = min over rows of the term's
    counter — ≥ the true count, with the classic CMS error bound.

    depth/width MUST match the build's (the sketch table carries no
    metadata): a mismatched probe hashes into the wrong cells and can
    under-report below the true count, silently breaking the CMS
    upper-bound guarantee.  The width fold check mirrors build_cms, and a
    runtime bounds guard fails loudly when the sketch holds cells/rows
    the probe's (depth, width) could never address — i.e. probe params
    SMALLER than the build's.  (Probe params larger than the build's are
    indistinguishable from empty counters in a sparse sketch; carry the
    params out-of-band if that direction matters.)"""
    if 65536 % width:
        raise ValueError("width must divide 65536 (4-hex-char hash fold)")
    # dedupe first: min() makes the estimate robust to duplicate input
    # terms, but the probe fan-out (and join) shouldn't pay k× per copy
    keyed = terms.select(F.col(term_col).alias("term")).distinct()
    probes = None
    for r in range(depth):
        p = keyed.select("term", F.lit(r).alias("row"),
                         _cell(F.col("term"), r, width).alias("cell"))
        probes = p if probes is None else probes.unionByName(p)
    # bounds guard: one broadcast row over the (<= depth×width-row) sketch
    bounds = cms.agg(F.max("cell").alias("_bc"), F.max("row").alias("_br"))
    est = (probes.join(cms, on=["row", "cell"], how="left")
           .groupBy("term")
           .agg(F.min(F.coalesce("n", F.lit(0))).alias("est")))
    chk = F.when(
        (F.col("_bc") >= width) | (F.col("_br") >= depth),
        F.raise_error(F.concat(
            F.lit("cms_estimate depth/width mismatch: sketch has cell "),
            F.col("_bc").cast("string"), F.lit(" / row "),
            F.col("_br").cast("string"),
            F.lit(f", probe expects cell < {width} / row < {depth}"))),
    ).otherwise(F.col("est"))
    return (est.crossJoin(F.broadcast(bounds))
            .select("term", chk.alias("est")))


BLOOM_BITS = 16384   # must divide 65536 (4-hex-char fold)
BLOOM_K = 4


def _bloom_bit(token_col, k: int, n_bits: int):
    h = F.md5(F.concat(F.lit(f"b{k}|"), token_col))
    return F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("int"),
                  F.lit(n_bits))


def build_bloom(tokens: DataFrame, token_col: str = "token",
                n_bits: int = BLOOM_BITS, k: int = BLOOM_K) -> DataFrame:
    """token rows -> (bit) set-bit table (<= n_bits rows regardless of
    corpus size — the sparse representation of the filter).  Mergeable:
    union two filters and take DISTINCT.  Deterministic md5 hashing, so
    an oracle (or another engine) rebuilds it bit for bit — Spark's own
    bloom_filter_agg is not cross-engine portable."""
    if 65536 % n_bits:
        raise ValueError("n_bits must divide 65536 (4-hex-char hash fold)")
    bits = F.explode(F.array(*[
        _bloom_bit(F.col(token_col), i, n_bits) for i in range(k)]))
    return tokens.select(bits.alias("bit")).distinct()


def bloom_contains(bloom: DataFrame, terms: DataFrame,
                   term_col: str = "term",
                   n_bits: int = BLOOM_BITS, k: int = BLOOM_K) -> DataFrame:
    """(term) rows -> (term, maybe_present): true iff ALL k probe bits
    are set — no false negatives ever; false positives at the classic
    (1 - e^{-kn/m})^k rate.  n_bits/k MUST match the build (same
    contract as cms_estimate).

    Probes are fanned out from the DEDUPED term set: a duplicated input
    term would contribute k rows per occurrence, making n_set a multiple
    of k and the ``== k`` membership test falsely negative — violating
    the filter's core contract (ADVICE r03)."""
    if 65536 % n_bits:
        raise ValueError("n_bits must divide 65536 (4-hex-char hash fold)")
    keyed = terms.select(F.col(term_col).alias("term")).distinct()
    probes = None
    for i in range(k):
        p = keyed.select("term",
                         _bloom_bit(F.col("term"), i, n_bits).alias("bit"))
        probes = p if probes is None else probes.unionByName(p)
    hits = (probes.join(bloom, on="bit", how="left_semi")
            .groupBy("term").agg(F.count(F.lit(1)).alias("n_set")))
    return (keyed.join(hits, on="term", how="left")
            .select("term",
                    (F.coalesce("n_set", F.lit(0)) == k)
                    .alias("maybe_present")))


# -- HyperLogLog (distinct cardinality) -------------------------------------

HLL_B = 6          # 2^6 = 64 registers (4-hex-char fold headroom)
HLL_RHO_CAP = 40   # keeps 2^(CAP - rho) sums exactly representable


def build_hll(items: DataFrame, col: str = "token",
              b: int = HLL_B) -> DataFrame:
    """Deterministic HyperLogLog registers: (reg, max_rho).

    Flajolet et al.'s estimator with the engine-portable md5 hash
    discipline of build_cms: register = 4-hex-char fold mod m, rho =
    1 + leading zero bits of the next 64 hash bits (hex chars 5..20),
    capped at HLL_RHO_CAP so every downstream 2^(CAP-rho) term is an
    exact integer (the cap costs nothing below ~2^40 distincts).

    Scale shape: one groupBy on ≤ m register ids with max() partial
    aggregation — bounded state, mergeable (union sketches and re-max
    on reg), the same posture as the CMS/Bloom siblings.  Spark's own
    approx_count_distinct is the production fast path; this sketch
    exists where the register table itself must be portable and
    cross-engine reproducible.
    """
    m = 1 << b
    if 65536 % m:
        raise ValueError("2^b must divide 65536 (4-hex-char hash fold)")
    h = F.md5(F.col(col))
    reg = F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("int"), F.lit(m))
    tail = F.substring(h, 5, 16)
    z = F.length(F.regexp_extract(tail, "^(0*)", 1))
    v = F.conv(F.substr(tail, z + F.lit(1), F.lit(1)), 16, 10).cast("int")
    lz_nib = (F.when(v >= 8, F.lit(0)).when(v >= 4, F.lit(1))
              .when(v >= 2, F.lit(2)).otherwise(F.lit(3)))
    rho = F.least(
        F.when(z >= 16, F.lit(65)).otherwise(z * 4 + lz_nib + 1),
        F.lit(HLL_RHO_CAP))
    return (items.select(reg.alias("reg"), rho.alias("rho"))
            .groupBy("reg").agg(F.max("rho").alias("max_rho")))


def hll_estimate(registers: DataFrame, b: int = HLL_B) -> float:
    """Cardinality estimate from a build_hll register table (driver-side
    — the table is ≤ 2^b rows by construction).  Standard HLL: harmonic
    mean with alpha_m bias correction, linear counting when E ≤ 2.5m
    and empty registers remain."""
    import math
    m = 1 << b
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    got = {r["reg"]: r["max_rho"] for r in registers.collect()}
    s = sum(2.0 ** -got.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = m - len(got)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est
