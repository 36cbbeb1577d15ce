"""Mergeable distributed sketches, oracle-checkable by construction.

Spark's own approx_count_distinct is a HyperLogLog whose register
layout is engine-internal — it cannot be cross-checked value-for-value
against another engine. This module builds the sketch EXPLICITLY from
md5 (the one hash both Spark and DuckDB evaluate identically), so the
full register table is a deterministic DataFrame: the DuckDB oracle
hash-compares every register, and the estimate is plain arithmetic
over them.

Scale shape: the register table IS the map-side-combinable state —
``groupBy(bucket).agg(max(rho))`` shuffles at most m=256 rows per
input partition regardless of input size, and two sketches merge by
the same max. That is the whole point of HLL at 100 TB: a distinct
count over any partitioning with a 256-row shuffle.

Register derivation (identical in both engines, string-domain only):
  h        = md5(cast(key as string))            32 hex chars
  bucket   = first 2 hex chars -> 0..255         (b = 8 bits)
  tail     = next 6 hex chars  -> 24-bit suffix
  rho      = 1 + leading zero BITS of tail       (25 if tail == 0)
leading zeros = 4 * (stripped leading '0' nibbles) + per-nibble CASE
lookup on the first non-zero nibble — no base conversion, no log2,
no float anywhere until the final estimate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import stable_round

HLL_BUCKETS = 256  # b = 8 bits
HLL_TAIL_HEX = 6  # 24-bit suffix
_MAX_RHO = 4 * HLL_TAIL_HEX + 1

# leading zero bits contributed by the first non-zero hex nibble
_NIBBLE_LZ = {
    "1": 3,
    "2": 2, "3": 2,
    "4": 1, "5": 1, "6": 1, "7": 1,
    "8": 0, "9": 0, "a": 0, "b": 0, "c": 0, "d": 0, "e": 0, "f": 0,
}


def _rho(tail: Column) -> Column:
    """1 + leading zero bits of the 6-hex-char tail (25 if zero)."""
    stripped = F.regexp_replace(tail, "^0+", "")
    nibble_zeros = (F.length(tail) - F.length(stripped)) * 4
    first = F.substring(stripped, 1, 1)
    head_zeros = F.lit(0)
    for ch, lz in _NIBBLE_LZ.items():
        head_zeros = F.when(first == ch, F.lit(lz)).otherwise(head_zeros)
    return (
        F.when(F.length(stripped) == 0, F.lit(_MAX_RHO))
        .otherwise(nibble_zeros + head_zeros + 1)
        .cast("int")
    )


def hll_registers(df: DataFrame, key: Column) -> DataFrame:
    """The sketch itself: (bucket, max_rho) — at most 256 rows, exact
    integers, mergeable with any other sketch of the same layout by
    bucket-wise max."""
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    tail = F.substring(h, 3, HLL_TAIL_HEX)
    return (
        df.select(bucket.alias("bucket"), _rho(tail).alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def _linear_counting_lut() -> list[float]:
    """m * ln(m / V) for V = 1..m-1, precomputed in Python so Spark and
    DuckDB use bit-identical double CONSTANTS — JVM Math.log and libm
    log may differ in the last ulp, which would break hash-exact
    cross-checking."""
    import math

    m = HLL_BUCKETS
    return [m * math.log(m / v) for v in range(1, m)]


def hll_estimate(registers: DataFrame) -> DataFrame:
    """HyperLogLog estimate with the standard small-range correction:
    raw = alpha_m * m^2 / (sum over ALL m registers of 2^-M_j), with
    absent buckets contributing 2^0 = 1; when raw <= 2.5m and V > 0
    registers are empty, switch to linear counting m*ln(m/V) (the raw
    formula is biased high at low cardinality). Correction constants
    come from a precomputed literal table mirrored into the oracle."""
    m = HLL_BUCKETS
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("present_sum"),
        F.count("*").alias("present_buckets"),
    )
    harm = F.col("present_sum") + (F.lit(m) - F.col("present_buckets"))
    raw = F.lit(alpha) * m * m / harm
    v = (F.lit(m) - F.col("present_buckets")).cast("int")
    lut = F.array(*[F.lit(x) for x in _linear_counting_lut()])
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.element_at(lut, v)
    ).otherwise(raw)
    return agg.select(stable_round(est, 2).alias("hll_estimate"))


CMS_DEPTH = 4  # independent salted hash rows
CMS_HEX = 3  # 3 hex chars -> width 4096
CMS_WIDTH = 16**CMS_HEX


def _cms_bucket(term: Column, salt: int) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), term)), 1, CMS_HEX),
        16,
        10,
    ).cast("int")


def cms_counters(df: DataFrame, term: Column) -> DataFrame:
    """Count-min counter table: (salt, bucket, cnt) — at most
    depth*width rows of exact integers, mergeable by summing cnt.
    One explode (depth rows per item, map-side) + one hash aggregate
    whose map-side partials cap the shuffle at depth*width rows per
    input partition."""
    fanned = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("salt"),
                        _cms_bucket(term, s).alias("bucket"),
                    )
                    for s in range(CMS_DEPTH)
                ]
            )
        ).alias("sb")
    )
    return (
        fanned.select("sb.salt", "sb.bucket")
        .groupBy("salt", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame, term: Column, k: int = 20
) -> DataFrame:
    """Top-k terms by count-min ESTIMATE (min over the depth rows of
    the term's counter). The estimate never undercounts; collisions
    can overcount by ~N/width per row, which min() suppresses.

    The candidate set here is the distinct terms themselves (the
    fixtures fit); at 100 TB the sketch answers point queries for an
    EXTERNAL candidate list without storing the term universe — the
    join shape below is unchanged, only the left side shrinks."""
    terms = df.select(term.alias("term")).distinct()
    counters = cms_counters(df, term)
    return cms_topk_from_counters(counters, terms, k)


def cms_topk_from_counters(
    counters: DataFrame, terms: DataFrame, k: int = 20
) -> DataFrame:
    """Top-k readout against an ALREADY-BUILT counter table (batch or
    the complete-mode streaming state): probe each candidate term's
    depth buckets, estimate = min over the depth rows. Decouples the
    sketch build from the readout — the shape that answers point
    queries for an external candidate list without re-scanning the
    stream."""
    probes = terms.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("salt"),
                        _cms_bucket(F.col("term"), s).alias("bucket"),
                    )
                    for s in range(CMS_DEPTH)
                ]
            )
        ).alias("sb"),
    ).select("term", "sb.salt", "sb.bucket")
    est = (
        probes.join(counters, ["salt", "bucket"])
        .groupBy("term")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.orderBy(F.desc("est_count"), F.asc("term"))
        .limit(k)
        .select("term", "est_count")
    )


HIST_BINS = 32


def value_histogram(df: DataFrame, value: Column) -> DataFrame:
    """Equi-width histogram sketch: (bin, lo, hi, n) over the value's
    observed range — mergeable by summing n (same range), deterministic
    both engines (bin edges derive from min/max by the same float ops
    in the same order). Two aggregates: a 1-row min/max broadcast,
    then one hash aggregate on the bin id. The quantile-from-histogram
    estimate lives in tests — the sketch itself is the contract."""
    bounds = df.agg(
        F.min(value).alias("vmin"), F.max(value).alias("vmax")
    )
    step = (F.col("vmax") - F.col("vmin")) / HIST_BINS
    binned = df.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(HIST_BINS - 1),
            F.floor((value - F.col("vmin")) / step).cast("int"),
        ).alias("bin"),
        F.col("vmin"),
        step.alias("step"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.first("vmin").alias("vmin"),
            F.first("step").alias("step"),
        )
        .select(
            "bin",
            stable_round(F.col("vmin") + F.col("bin") * F.col("step"), 6).alias("lo"),
            stable_round(F.col("vmin") + (F.col("bin") + 1) * F.col("step"), 6).alias("hi"),
            "n",
        )
    )


def histogram_median(hist: DataFrame) -> DataFrame:
    """Median estimate from the histogram sketch: midpoint of the
    first bin where the cumulative count crosses half the total.
    Runs over the <= HIST_BINS-row sketch, so the unpartitioned
    window is a non-issue at any input scale."""
    from pyspark.sql import Window

    cum = F.sum("n").over(
        Window.orderBy("bin").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    total = F.sum("n").over(Window.partitionBy())
    return (
        hist.withColumn("cum", cum)
        .withColumn("total", total)
        .filter(F.col("cum") * 2 >= F.col("total"))
        .orderBy("bin")
        .limit(1)
        .select(
            stable_round((F.col("lo") + F.col("hi")) / 2.0, 6).alias(
                "median_est"
            )
        )
    )


# ---------------- Bloom filter ----------------
#
# Same design rule as HLL/CMS above: the sketch is built EXPLICITLY
# from md5 so the register table is a deterministic DataFrame that
# DuckDB can rebuild bit-for-bit. 4096 bits laid out as 128 words of
# 32 bits each (masks stay well inside BIGINT in both engines), k=4
# salted hash functions; size the bit count ~10x the expected build
# side (m/n ~ 13 here at oracle scale keeps FP well under 1%).
#
# Scale shape: ``groupBy(word).agg(bit_or)`` shuffles at most
# BLOOM_WORDS=128 rows per input partition regardless of build-side
# size, and two filters over the same layout merge by bit_or — the
# classic use is runtime join pruning: build on the small/filtered
# side, broadcast the 128-row register table, and drop probe rows
# before they reach the shuffle. Never a false negative; false
# positives only widen the prune, never break correctness.

BLOOM_WORDS = 128  # 128 words x 32 bits = 4096 bits
BLOOM_BITS_PER_WORD = 32
BLOOM_K = 4  # salted hash functions


def _bloom_word_bit(key: Column, salt: int) -> tuple[Column, Column]:
    """(word index, bit index) for one salted hash: hex chars 1-2 of
    md5('salt:key') pick the word (mod 128), chars 3-4 pick the bit
    (mod 32) — uniform and engine-identical."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key))
    word = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % BLOOM_WORDS
    bit = (
        F.conv(F.substring(h, 3, 2), 16, 10).cast("int")
        % BLOOM_BITS_PER_WORD
    )
    return word, bit


def _bloom_mask(bit: Column) -> Column:
    # 2^bit for bit <= 31: exact in double, fits BIGINT (shiftleft
    # needs a literal shift amount, so pow is the portable form)
    return F.pow(F.lit(2.0), bit).cast("long")


def bloom_registers(df: DataFrame, key: Column) -> DataFrame:
    """Build the filter: (word int, bits long), <= 128 rows.

    One map-side explode (k rows per key) + one hash aggregate whose
    map-side bit_or partials cap the shuffle at 128 rows per input
    partition."""
    fanned = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        w.alias("word"), _bloom_mask(b).alias("mask")
                    )
                    for w, b in (
                        _bloom_word_bit(key, s) for s in range(BLOOM_K)
                    )
                ]
            )
        ).alias("wb")
    )
    return (
        fanned.select("wb.word", "wb.mask")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(
    probe: DataFrame, key: Column, registers: DataFrame
) -> DataFrame:
    """Membership test: probe rows gain ``might_contain`` (true iff
    all k bits are set). The register table collapses to ONE row
    (word->bits map) and broadcasts — the probe side is a pure map,
    so bloom pruning composes with any downstream join without
    adding a shuffle."""
    reg_row = registers.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("regmap")
    )
    probed = probe.join(F.broadcast(reg_row))
    ok = F.lit(True)
    for s in range(BLOOM_K):
        w, b = _bloom_word_bit(key, s)
        hit = (
            F.coalesce(
                F.element_at(F.col("regmap"), w), F.lit(0).cast("long")
            ).bitwiseAND(_bloom_mask(b))
            != 0
        )
        ok = ok & hit
    return probed.withColumn("might_contain", ok).drop("regmap")


# ---------------- sketch compositions ----------------
#
# Two classic compositions an optimizer/planner uses at 100 TB, both
# pure arithmetic over the already-mergeable register tables:
#
# - JOIN-SIZE ESTIMATION from count-min sketches: for equi-join keys,
#   |L JOIN R| = sum_k |L_k|*|R_k|, and each CMS row's inner product
#   sum_b cntL[b]*cntR[b] equals that plus non-negative collision
#   mass — so min over the depth rows NEVER undercounts the true
#   join size (AMS/CM inner-product estimate). Cost: one 4x4096-row
#   join, no touch of the data itself.
#
# - SET OPERATIONS on HyperLogLog: union is bucket-wise max of the
#   registers (exact — the union sketch IS what building over
#   concatenated inputs would produce), intersection is
#   inclusion-exclusion over the three estimates (no better primitive
#   exists for plain HLL; error grows as the true overlap shrinks —
#   declared semantics).


def cms_join_size(
    left: DataFrame, lkey: Column, right: DataFrame, rkey: Column
) -> DataFrame:
    """Estimate |left JOIN right| on an equi-key from the two CMS
    counter tables alone: per-salt inner product + min across salts.
    Returns (salt, dot_product, est_join_size) — depth rows, the
    estimate repeated for self-containment."""
    from pyspark.sql import Window

    cl = cms_counters(left, lkey).withColumnRenamed("cnt", "cnt_l")
    cr = cms_counters(right, rkey).withColumnRenamed("cnt", "cnt_r")
    dots = (
        cl.join(cr, ["salt", "bucket"])
        .groupBy("salt")
        .agg(F.sum(F.col("cnt_l") * F.col("cnt_r")).alias("dot_product"))
    )
    est = F.min("dot_product").over(Window.partitionBy())
    return dots.select("salt", "dot_product", est.alias("est_join_size"))


def hll_merge(ra: DataFrame, rb: DataFrame) -> DataFrame:
    """Union of two HLL sketches: bucket-wise max over the full outer
    join of the register tables (<= 256 rows each side)."""
    a = ra.select("bucket", F.col("max_rho").alias("ra"))
    b = rb.select("bucket", F.col("max_rho").alias("rb"))
    return a.join(b, "bucket", "full").select(
        "bucket",
        F.greatest(
            F.coalesce(F.col("ra"), F.lit(0)),
            F.coalesce(F.col("rb"), F.lit(0)),
        ).cast("int").alias("max_rho"),
    )


def hll_set_ops(
    a: DataFrame, akey: Column, b: DataFrame, bkey: Column
) -> DataFrame:
    """One-row summary (est_a, est_b, est_union, est_intersection):
    the HLL estimates of both inputs, their register-max union, and
    the inclusion-exclusion intersection clamped at 0. All arithmetic
    happens on the 2-decimal rounded estimates so the composition is
    engine-exact."""
    ra, rb = hll_registers(a, akey), hll_registers(b, bkey)
    ea = hll_estimate(ra).withColumnRenamed("hll_estimate", "est_a")
    eb = hll_estimate(rb).withColumnRenamed("hll_estimate", "est_b")
    eu = hll_estimate(hll_merge(ra, rb)).withColumnRenamed(
        "hll_estimate", "est_union"
    )
    inter = F.greatest(
        F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    # union + single-row aggregate instead of chained 1-row-x-1-row
    # crossJoins: same result, one hash aggregate in place of two
    # BroadcastNestedLoopJoin nodes
    one = (
        ea.select(F.col("est_a").alias("v"), F.lit("a").alias("k"))
        .unionByName(
            eb.select(F.col("est_b").alias("v"), F.lit("b").alias("k"))
        )
        .unionByName(
            eu.select(
                F.col("est_union").alias("v"), F.lit("u").alias("k")
            )
        )
        .agg(
            F.max(F.when(F.col("k") == "a", F.col("v"))).alias("est_a"),
            F.max(F.when(F.col("k") == "b", F.col("v"))).alias("est_b"),
            F.max(F.when(F.col("k") == "u", F.col("v"))).alias(
                "est_union"
            ),
        )
    )
    return one.select(
        "est_a",
        "est_b",
        "est_union",
        stable_round(inter, 2).alias("est_intersection"),
    )


def hll_registers_by_group(
    df: DataFrame, group: Column, key: Column
) -> DataFrame:
    """Per-group HLL register tables: (g, bucket, max_rho) — at most
    256 rows per group, the per-domain distinct-count shape (distinct
    users per event type, distinct documents per source, ...). Same
    map-side-combinable aggregate as the global sketch, keyed by
    (group, bucket)."""
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    tail = F.substring(h, 3, HLL_TAIL_HEX)
    return (
        df.select(
            group.alias("g"),
            bucket.alias("bucket"),
            _rho(tail).alias("rho"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_by_group(registers: DataFrame) -> DataFrame:
    """(g, hll_estimate) from per-group register tables — identical
    constants and small-range correction as the global estimate."""
    m = HLL_BUCKETS
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy("g").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("present_sum"),
        F.count("*").alias("present_buckets"),
    )
    harm = F.col("present_sum") + (F.lit(m) - F.col("present_buckets"))
    raw = F.lit(alpha) * m * m / harm
    v = (F.lit(m) - F.col("present_buckets")).cast("int")
    lut = F.array(*[F.lit(x) for x in _linear_counting_lut()])
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.element_at(lut, v)
    ).otherwise(raw)
    return agg.select("g", stable_round(est, 2).alias("hll_estimate"))


# ---------------------------------------------------------------------------
# Mergeable rank-based quantile sketch (HDR-histogram-style).
#
# value_histogram's equi-width bins are DATA-RANGE DEPENDENT (min/max
# must be known first, and one outlier stretches every bin); the robust
# 100 TB quantile answer is a sketch whose bucket boundaries are fixed
# a priori and whose registers merge by addition. KLL and t-digest are
# the textbook choices, but both are RANDOMIZED (KLL's coin-flip
# compaction) or order-dependent (t-digest's centroid accretion) — a
# register table built by either differs across engines and
# partitionings, so neither can be value-hash-checked against DuckDB.
# The deterministic sketch with the same mergeable-rank contract is the
# HDR histogram: base-2 exponent buckets subdivided linearly into
# 2^QSK_SUB_BITS sub-buckets, giving a GUARANTEED relative value error
# of 2^-QSK_SUB_BITS per quantile while the register table stays
# O(sub_buckets * log(max/min)) rows — ~64 rows per octave, fixed
# forever, whatever the data range turns out to be.
#
# Everything up to the final descale is integer arithmetic on the
# scale-QSK_QS-quantized value (floor(v * 10^qs + 0.5), the same
# kernel as rounding.py), and the exponent comes from the LENGTH OF
# THE BINARY STRING (bin(q) has no padding and no prefix in either
# engine) — no log2, no float, so registers are bit-identical across
# engines and partitionings:
#
#   q      = floor(value * 10^qs + 0.5)          non-negative declared
#   s      = max(0, (len(bin(q)) - 1) - B)       shift for this octave
#   bucket = s * 2^B + (q >> s)                  monotone in q
#   lb     = (q >> s) << s                       bucket's lowest q
#   width  = 1 << s                              bucket's q span
#
# Merge = sum of n by bucket (lb/width are functionally determined).
# Quantile: first bucket whose cumulative count reaches ceil(p * N),
# reported at the bucket midpoint lb + (width-1) div 2, descaled.
# ---------------------------------------------------------------------------

QSK_QS = 3  # 1e-3 value resolution before bucketing
QSK_SUB_BITS = 6  # 64 sub-buckets per octave -> rel. error <= 1/64


def quantile_sketch_registers(df: DataFrame, value: Column) -> DataFrame:
    """Register table (bucket, lb_q, width_q, n) of the HDR quantile
    sketch over a NON-NEGATIVE value column. One shuffle of at most
    ~64 * 64 rows per input partition at any input size; two sketches
    merge by summing ``n`` per bucket."""
    from ..functions.rounding import quantize

    b = QSK_SUB_BITS
    staged = df.select(quantize(value, QSK_QS).alias("q")).select(
        "q",
        F.greatest(
            (F.length(F.bin(F.col("q"))) - 1) - F.lit(b), F.lit(0)
        ).cast("int").alias("s"),
    )
    return (
        staged.select(
            (
                F.col("s").cast("long") * (1 << b)
                + F.expr("shiftright(q, s)")
            ).alias("bucket"),
            F.expr("shiftleft(shiftright(q, s), s)").alias("lb"),
            F.expr("shiftleft(CAST(1 AS BIGINT), s)").alias("width"),
        )
        .groupBy("bucket")
        .agg(
            F.min("lb").alias("lb_q"),
            F.min("width").alias("width_q"),
            F.count("*").alias("n"),
        )
    )


QSK_PS = (0.5, 0.9, 0.99)


def quantile_sketch_estimate(
    registers: DataFrame, ps: tuple[float, ...] = QSK_PS
) -> DataFrame:
    """(p, est): the sketch's quantile estimates — first bucket whose
    cumulative count reaches rank ceil(p * N), valued at the bucket
    midpoint. Pure arithmetic over the register table (a few hundred
    rows), exact-integer until the final descale."""
    from pyspark.sql import Window

    total = registers.agg(F.sum("n").alias("N"))
    cum = registers.withColumn(
        "cum",
        F.sum("n").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    p_df = registers.sparkSession.createDataFrame(
        [(float(p),) for p in ps], "p DOUBLE"
    )
    targets = p_df.crossJoin(F.broadcast(total)).select(
        "p", F.ceil(F.col("p") * F.col("N").cast("double")).alias("rank")
    )
    hit = (
        targets.join(cum, F.col("cum") >= F.col("rank"))
        .groupBy("p")
        .agg(F.min("bucket").alias("bucket"))
        .join(cum.select("bucket", "lb_q", "width_q"), "bucket")
    )
    est = (
        F.col("lb_q") + F.expr("(width_q - 1) div 2")
    ).cast("double") / F.lit(float(10**QSK_QS))
    return hit.select("p", est.alias("est"))


def quantile_sketch_registers_by_group(
    df: DataFrame, group: Column, value: Column
) -> DataFrame:
    """Per-group HDR quantile registers — (g, bucket, lb_q, width_q,
    n), the per-event-type latency-quantile shape: state is <= a few
    hundred exact-integer rows PER GROUP at any input size, and
    groups merge independently by summing n."""
    from ..functions.rounding import quantize

    b = QSK_SUB_BITS
    staged = df.select(
        group.alias("g"), quantize(value, QSK_QS).alias("q")
    ).select(
        "g",
        "q",
        F.greatest(
            (F.length(F.bin(F.col("q"))) - 1) - F.lit(b), F.lit(0)
        ).cast("int").alias("s"),
    )
    return (
        staged.select(
            "g",
            (
                F.col("s").cast("long") * (1 << b)
                + F.expr("shiftright(q, s)")
            ).alias("bucket"),
            F.expr("shiftleft(shiftright(q, s), s)").alias("lb"),
            F.expr("shiftleft(CAST(1 AS BIGINT), s)").alias("width"),
        )
        .groupBy("g", "bucket")
        .agg(
            F.min("lb").alias("lb_q"),
            F.min("width").alias("width_q"),
            F.count("*").alias("n"),
        )
    )


def quantile_sketch_registers_by_group_prequantized(
    counts: DataFrame, group: Column, q: Column, weight: Column
) -> DataFrame:
    """Grouped HDR registers from a PRE-AGGREGATED (group, quantized
    value, weight) table — the profiler shape, where the corpus was
    already collapsed to per-value counts. Identical registers to
    feeding the raw rows through quantile_sketch_registers_by_group:
    equal quantized values land in the same bucket, so summing the
    weights reproduces the raw count(*) exactly. ``q`` must already
    be the non-negative quantize()d long."""
    b = QSK_SUB_BITS
    staged = counts.select(
        group.alias("g"), q.alias("q"), weight.alias("wt")
    ).select(
        "g",
        "q",
        "wt",
        F.greatest(
            (F.length(F.bin(F.col("q"))) - 1) - F.lit(b), F.lit(0)
        ).cast("int").alias("s"),
    )
    return (
        staged.select(
            "g",
            (
                F.col("s").cast("long") * (1 << b)
                + F.expr("shiftright(q, s)")
            ).alias("bucket"),
            F.expr("shiftleft(shiftright(q, s), s)").alias("lb"),
            F.expr("shiftleft(CAST(1 AS BIGINT), s)").alias("width"),
            "wt",
        )
        .groupBy("g", "bucket")
        .agg(
            F.min("lb").alias("lb_q"),
            F.min("width").alias("width_q"),
            F.sum("wt").alias("n"),
        )
    )


def quantile_sketch_estimate_by_group(
    registers: DataFrame, ps: tuple[float, ...] = QSK_PS
) -> DataFrame:
    """(g, p, est): per-group quantile estimates off the grouped
    register table — same rank/midpoint arithmetic as the global
    estimate, windows partitioned by group. Register-table-sized
    work only."""
    from pyspark.sql import Window

    totals = registers.groupBy("g").agg(F.sum("n").alias("N"))
    cum = registers.withColumn(
        "cum",
        F.sum("n").over(
            Window.partitionBy("g")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    p_df = registers.sparkSession.createDataFrame(
        [(float(p),) for p in ps], "p DOUBLE"
    )
    targets = totals.crossJoin(F.broadcast(p_df)).select(
        "g",
        "p",
        F.ceil(F.col("p") * F.col("N").cast("double")).alias("rank"),
    )
    hit = (
        targets.alias("t")
        .join(
            cum.alias("c"),
            (F.col("t.g") == F.col("c.g"))
            & (F.col("c.cum") >= F.col("t.rank")),
        )
        .groupBy(F.col("t.g").alias("g"), "p")
        .agg(F.min("c.bucket").alias("bucket"))
    )
    decode = cum.select(
        F.col("g").alias("_dg"),
        F.col("bucket").alias("_db"),
        "lb_q",
        "width_q",
    )
    est = (
        F.col("lb_q") + F.expr("(width_q - 1) div 2")
    ).cast("double") / F.lit(float(10**QSK_QS))
    return hit.join(
        decode,
        (F.col("g") == F.col("_dg")) & (F.col("bucket") == F.col("_db")),
    ).select("g", "p", est.alias("est"))
