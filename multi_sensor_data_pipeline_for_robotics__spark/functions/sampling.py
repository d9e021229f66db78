"""Deterministic sampling / splitting for training-data pipelines.

``df.sample()``/``sampleBy()`` draw per-partition pseudo-random numbers:
the sample CHANGES when the partitioning changes (file splits, AQE,
cluster size) — a reproducibility hazard for dataset building. The
scalable reproducible alternative is HASH-MOD sampling: membership is a
pure function of the row's key, so any engine, any partitioning, any
rerun selects the same rows, and downstream incremental runs stay
consistent.

The bucket hash is the first 28 bits of sha256(key) — portable across
engines (same trick as the portable MinHash family) and uniform enough
for rate control at ±0.1% on real keyspaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(key: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Stable bucket in [0, n_buckets) from sha256 of the key's string
    form. Engine-portable: any SQL engine with sha256 + hex parsing
    reproduces it bit-for-bit."""
    h = F.conv(F.substring(F.sha2(key.cast("string"), 256), 1, 7), 16, 10).cast(
        "long"
    )
    return h % n_buckets


def hash_sample(
    df: DataFrame, key: str, rate: float, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen purely by key hash. Same key ->
    same decision, forever, on any cluster."""
    return df.filter(hash_bucket(F.col(key), n_buckets) < int(rate * n_buckets))


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing /
    domain-reweighting primitive (sample each language/source/domain at
    its own target rate when assembling a training mix).

    Membership is a pure function of (key hash, stratum rate): no
    shuffle, no state, reproducible on any cluster and composable with
    incremental ingestion (new rows of a stratum never change old
    decisions). Strata not listed in ``rates`` get ``default_rate``.
    """
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {name!r} must be in [0, 1], got {r}")
    b = hash_bucket(F.col(key), n_buckets)
    thr = None
    for name, r in rates.items():
        cond = F.col(strata_col) == name
        edge = int(r * n_buckets)
        thr = F.when(cond, edge) if thr is None else thr.when(cond, edge)
    default_edge = int(default_rate * n_buckets)
    thr = F.lit(default_edge) if thr is None else thr.otherwise(default_edge)
    return df.filter(b < thr)


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_col: str = "split",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Disjoint deterministic splits (e.g. train/val/test).

    ``weights``: split name -> fraction; fractions must sum to <= 1
    (the remainder, if any, is dropped). Boundaries are cumulative
    bucket ranges, so growing one split never reshuffles rows between
    the OTHER splits.
    """
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    b = hash_bucket(F.col(key), n_buckets)
    expr = None
    edge = 0
    for name, w in weights.items():
        edge += int(w * n_buckets)
        cond = b < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    out = df.withColumn(split_col, expr)  # rows past the last edge -> NULL
    return out.filter(F.col(split_col).isNotNull())


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row gets priority ``u^(1/w)`` — expressed as
    the equivalent order key ``ln(u)/w`` — with ``u`` a uniform from
    the row KEY's sha256, and the k best priorities win. Inclusion
    probability is proportional to weight, the draw is a pure function
    of (key, weight), and the same rows are selected on any engine,
    partitioning, or rerun — the temperature-weighted corpus-mixing
    primitive (weight = quality score, upweight rare domains, ...).

    Selection uses ``orderBy().limit(k)`` globally (TakeOrderedAndProject
    — no full sort of corpus data) and, per group, the lossless
    two-phase salted ranking (rank within (group, key-hash salt) first,
    then re-rank the ≤ k·S survivors — every global top-k priority is
    its salt bucket's top-k, so no group's full row set ever funnels
    through one task; same law as ``grouped_bottom_k``). Weights must
    be > 0; ties in the order key are broken by the hash itself
    (measure-zero for distinct keys).
    """
    from pyspark.sql import Window as W

    hraw = F.conv(
        F.substring(F.sha2(F.col(key).cast("string"), 256), 1, 13), 16, 10
    ).cast("long")
    h = hraw.cast("double")
    # u in (0, 1]: (h+1) / 16^13 — never 0, so ln(u) is finite
    u = (h + F.lit(1.0)) / F.lit(float(16 ** 13))
    order_key = F.log(u) / F.col(weight_col).cast("double")
    # maximize u^(1/w)  <=>  maximize ln(u)/w  (ln(u) <= 0, w > 0)
    ok = order_key.alias("__aes")
    if group_col is None:
        out = (
            df.select("*", ok)
            .orderBy(F.col("__aes").desc())
            .limit(k)
            .drop("__aes")
        )
        return out
    salt_buckets = 64
    salted = df.select("*", ok, F.pmod(hraw, F.lit(salt_buckets)).alias("__gs"))
    w1 = W.partitionBy(group_col, "__gs").orderBy(F.col("__aes").desc())
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__gs", "__rn")
    )
    w2 = W.partitionBy(group_col).orderBy(F.col("__aes").desc())
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__aes", "__rn")
    )


def epoch_shuffle_key(key: Column, seed: int = 0) -> Column:
    """Deterministic training-epoch shuffle key: the first 13 hex
    digits (52 bits) of sha256(key '#epoch' seed) as a long. Sorting by
    (shuffle_key, key) is a uniform permutation of the corpus that any
    engine reproduces bit-for-bit; a different seed is a fresh,
    uncorrelated permutation — epoch reshuffling without ever
    materializing an order column driver-side."""
    return F.conv(
        F.substring(
            F.sha2(F.concat(key.cast("string"), F.lit(f"#epoch{seed}")), 256),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")


def epoch_shuffle(
    df: DataFrame,
    key: str,
    seed: int = 0,
    num_partitions: int | None = None,
    key_out: str = "shuffle_key",
) -> DataFrame:
    """Globally shuffle a corpus into deterministic training order:
    append :func:`epoch_shuffle_key` and realize the order as
    ``repartitionByRange(shuffle_key, key) + sortWithinPartitions`` —
    partition i holds the i-th contiguous slice of the permutation, so
    a sequential reader (or a parquet write) sees the full shuffled
    order WITHOUT any single-task global sort (range partitioning
    samples boundaries, then each partition sorts locally). The tie
    column ``key`` makes the order total even on 52-bit collisions."""
    out = df.withColumn(key_out, epoch_shuffle_key(F.col(key), seed))
    parts = [F.col(key_out), F.col(key)]
    if num_partitions is None:
        rp = out.repartitionByRange(*parts)
    else:
        rp = out.repartitionByRange(num_partitions, *parts)
    return rp.sortWithinPartitions(*parts)


def mixture_resample(
    df: DataFrame,
    key: str,
    source_col: str,
    target_shares: dict[str, float],
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Resample a multi-source corpus to TARGET mixture proportions —
    the dataset-mixing primitive (`stratified_hash_sample` takes
    per-source RATES; this takes the desired output SHARES and derives
    the rates from what is actually available).

    The output is the LARGEST hash-deterministic subsample whose
    expected composition matches ``target_shares``: with n_s rows
    available of source s and t_s its (normalized) share, the binding
    source fixes the total at c = min_s(n_s / t_s), and each source
    keeps c * t_s / n_s of its rows by key-hash threshold — the
    binding source keeps 100%, all sampling decisions remain pure
    functions of the key (rerun/engine/partitioning stable). Sources
    absent from ``target_shares`` are dropped. A source NAMED in
    ``target_shares`` but absent from the data fails the job with a
    clear error when the plan executes (strictly, the largest sample
    preserving the requested shares would be EMPTY — silently ignoring
    the missing source would ship a composition that deviates from the
    contract without signal).

    Scale shape: one tiny groupBy(source) count (map-side combined),
    driver-free threshold arithmetic on the ≤|sources|-row side, one
    broadcast join back, one hash filter. Output columns: the input's
    plus nothing — filtering only.
    """
    tot = float(sum(target_shares.values()))
    if tot <= 0:
        raise ValueError("target_shares must sum to a positive value")
    shares = {s: w / tot for s, w in target_shares.items()}
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(s, float(w)) for s, w in shares.items()], "__src string, __t double"
    )
    cnts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    # LEFT join from the requested shares so a zero-row source surfaces
    # as a NULL __n — turned into a lazy runtime error rather than a
    # silent composition drift (raise_error keeps the plan action-free
    # at build time; the check costs nothing extra, the groupBy count
    # was needed anyway).
    j = tgt.join(cnts, "__src", "left").select(
        "__src",
        "__t",
        F.when(F.col("__n").isNotNull(), F.col("__n"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("mixture_resample: source '"),
                    F.col("__src"),
                    F.lit(
                        f"' is named in target_shares but has no rows in"
                        f" column '{source_col}'"
                    ),
                )
            ).cast("long")
        )
        .alias("__n"),
    )
    # c = min_s n_s / t_s  (the largest total preserving the shares)
    c = j.agg(F.min(F.col("__n") / F.col("__t")).alias("__c"))
    thr = (
        j.crossJoin(F.broadcast(c))
        .select(
            "__src",
            F.floor(
                F.col("__c") * F.col("__t") / F.col("__n") * n_buckets
            ).alias("__thr"),
        )
    )
    b = hash_bucket(F.col(key), n_buckets)
    return (
        df.join(
            F.broadcast(thr), F.col(source_col) == F.col("__src"), "inner"
        )
        .filter(b < F.col("__thr"))
        .drop("__src", "__thr")
    )


def referential_subsample(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    rate: float,
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Referentially-CONSISTENT subsampling: hash-sample the parent
    table at ``rate``, then keep exactly the child rows whose foreign
    key survived — the "give me a 1% dev copy of the warehouse that
    still joins" primitive. Sampling each table independently breaks
    every FK (a 1% × 1% join keeps ~0.01%); sampling the parent and
    semi-joining children preserves join cardinality ratios and
    referential integrity by construction.

    Membership is a pure function of the PARENT key, so the same
    subset falls out on any engine/partitioning/rerun, and children of
    a kept parent are kept in full. The child filter is a semi-join —
    at scale it compiles to a broadcast/shuffled hash semi-join plus
    Spark's runtime bloom pruning; chain for grandchildren (sample
    orders, semi-join lineitem on orderkey).

    Returns (parent_sample, child_sample).
    """
    p = hash_sample(parent, parent_key, rate, n_buckets)
    c = child.join(
        p.select(F.col(parent_key).alias("__pk")).distinct(),
        F.col(child_fk) == F.col("__pk"),
        "left_semi",
    )
    return p, c


def kfold_assign(
    df: DataFrame, key: str, k: int = 5, fold_col: str = "fold"
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    sha256-bucket(key) mod k. Pure function of the key — folds are
    identical on any engine/partitioning/rerun, disjoint by
    construction, and STABLE under corpus growth (a new row lands in
    some fold; existing rows never move, unlike randomSplit).

    Scale shape: a codegen'd projection, no shuffle, no state. Use
    :func:`kfold_train_test` to expand one fold into the train/test
    pair.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(
        fold_col, (hash_bucket(F.col(key), N_BUCKETS) % k).cast("int")
    )


def kfold_train_test(
    df: DataFrame, key: str, k: int, fold: int, fold_col: str = "fold"
) -> tuple[DataFrame, DataFrame]:
    """(train, test) for CV round ``fold``: test = rows whose
    :func:`kfold_assign` fold equals ``fold``, train = the rest. Both
    are filters over one assignment — no data movement."""
    if not 0 <= fold < k:
        raise ValueError(f"fold must be in [0, {k}), got {fold}")
    assigned = kfold_assign(df, key, k, fold_col)
    test = assigned.filter(F.col(fold_col) == fold).drop(fold_col)
    train = assigned.filter(F.col(fold_col) != fold).drop(fold_col)
    return train, test


def group_sample_k(
    df: DataFrame,
    key: str,
    group_col: str,
    k: int,
    salt_buckets: int = 64,
) -> DataFrame:
    """Deterministic UNIFORM sample of (up to) ``k`` rows per group —
    "give me 1000 example documents per language" without a driver
    loop, without ``sample()``'s partitioning-dependence, and without
    sorting any group in a single task.

    Each row gets a 52-bit sha256 hash of its key (tagged, so the draw
    is independent of other hash uses of the same key); the k smallest
    hashes per group win. Selection is a pure function of the keys:
    any engine, cluster layout, or rerun picks the same rows, and a
    grown corpus only ever swaps rows in/out by hash order (stable
    pagination for review tooling).

    Scale shape: the two-phase salted ranking of ``grouped_bottom_k``
    — rank within (group, hash % S), keep ≤ k, re-rank the ≤ k·S
    survivors per group. Lossless (every global bottom-k hash is its
    salt bucket's bottom-k), so a billion-row group never funnels
    through one reducer. Ties (52-bit collisions) break on the key
    itself, keeping the order total and the result engine-portable.
    """
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.col(key).cast("string"), F.lit("#gsample")), 256),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    salted = df.select(
        "*", h.alias("__h"), F.pmod(h, F.lit(salt_buckets)).alias("__gs")
    )
    from pyspark.sql import Window as W

    w1 = W.partitionBy(group_col, "__gs").orderBy("__h", key)
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__gs", "__rn")
    )
    w2 = W.partitionBy(group_col).orderBy("__h", key)
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )


def group_sample_oracle_sql(
    table_sql: str, key: str, group_col: str, k: int
) -> str:
    """DuckDB twin of :func:`group_sample_k` — same tagged sha256 hash,
    single-window form (the salted two-phase is provably identical)."""
    h = (
        f"CAST(('0x' || substr(sha256(CAST({key} AS VARCHAR) || '#gsample'),"
        f" 1, 13)) AS BIGINT)"
    )
    return f"""
SELECT * EXCLUDE (__h, __rn) FROM (
    SELECT src.*, {h} AS __h,
           row_number() OVER (PARTITION BY {group_col}
                              ORDER BY {h}, {key}) AS __rn
    FROM ({table_sql}) src
) WHERE __rn <= {k}
"""


def temperature_resample(
    df: DataFrame,
    key: str,
    source_col: str,
    alpha: float = 0.5,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Temperature-scaled mixture resampling: derive the target shares
    FROM the data — share_s ∝ n_s^alpha — then take the largest
    hash-deterministic subsample matching them (the multilingual-LM
    upsampling scheme: alpha=1 keeps the natural mix untouched,
    alpha=0 equalizes all sources, alpha≈0.3-0.7 boosts low-resource
    sources without flattening the head).

    Same machinery as :func:`mixture_resample` with the share table
    computed in-plan: one tiny groupBy(source) count, share/threshold
    arithmetic on the ≤|sources|-row side, one broadcast join back,
    one key-hash filter. Deterministic; never an action at build time.

    With t_s = n_s^alpha / Σ n^alpha the binding source fixes the total
    at c = min_s(n_s / t_s) and each source keeps floor(c·t_s/n_s·B)/B
    of its rows. For alpha < 1 the binding source is the SMALLEST one
    (it keeps 100%); output size shrinks as alpha drops — equalizing a
    skewed mix costs data, by design, rather than duplicating rows.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    cnts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    nd = F.col("__n").cast("double")
    # sqrt/identity for the common alphas: IEEE-correctly-rounded in
    # every engine, unlike pow (libm pow may differ in the last ulp
    # across engines — harmless for sampling, but the oracle twin
    # compares floor'd thresholds bit-for-bit)
    if alpha == 0.5:
        na = F.sqrt(nd)
    elif alpha == 1.0:
        na = nd
    elif alpha == 0.0:
        na = F.lit(1.0)
    else:
        na = F.pow(nd, F.lit(alpha))
    pw = cnts.select("__src", "__n", na.alias("__na"))
    tot = pw.agg(F.sum("__na").alias("__tot"))
    j = pw.crossJoin(F.broadcast(tot)).select(
        "__src", "__n", (F.col("__na") / F.col("__tot")).alias("__t")
    )
    c = j.agg(F.min(F.col("__n") / F.col("__t")).alias("__c"))
    thr = j.crossJoin(F.broadcast(c)).select(
        "__src",
        F.floor(F.col("__c") * F.col("__t") / F.col("__n") * n_buckets).alias(
            "__thr"
        ),
    )
    b = hash_bucket(F.col(key), n_buckets)
    return (
        df.join(F.broadcast(thr), F.col(source_col) == F.col("__src"), "inner")
        .filter(b < F.col("__thr"))
        .drop("__src", "__thr")
    )


def temperature_oracle_sql(
    table_sql: str,
    key: str,
    source_col: str,
    alpha: float = 0.5,
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`temperature_resample` — identical operand
    order in the double arithmetic so the floor'd thresholds match
    bit-for-bit."""
    bucket = (
        f"(CAST(('0x' || substr(sha256(CAST({key} AS VARCHAR)), 1, 7))"
        f" AS BIGINT) % {n_buckets})"
    )
    if alpha == 0.5:
        na = "sqrt(CAST(__n AS DOUBLE))"
    elif alpha == 1.0:
        na = "CAST(__n AS DOUBLE)"
    elif alpha == 0.0:
        na = "CAST(1.0 AS DOUBLE)"
    else:
        na = f"pow(CAST(__n AS DOUBLE), {alpha!r})"
    return f"""
WITH src AS ({table_sql}),
cnts AS (SELECT {source_col} AS __src, count(*) AS __n FROM src GROUP BY 1),
pw AS (SELECT __src, __n, {na} AS __na FROM cnts),
tot AS (SELECT sum(__na) AS __tot FROM pw),
j AS (SELECT __src, __n, __na / __tot AS __t FROM pw CROSS JOIN tot),
c AS (SELECT min(__n / __t) AS __c FROM j),
thr AS (
    SELECT __src, floor(__c * __t / __n * {n_buckets}) AS __thr
    FROM j CROSS JOIN c
)
SELECT src.* FROM src JOIN thr ON src.{source_col} = thr.__src
WHERE {bucket} < thr.__thr
"""


def mixture_oracle_sql(
    table_sql: str,
    key: str,
    source_col: str,
    target_shares: dict[str, float],
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`mixture_resample` — same sha256 bucket,
    same min(n/t) total, same floor'd per-source thresholds."""
    tot = float(sum(target_shares.values()))
    shares = {s: w / tot for s, w in target_shares.items()}
    tgt_rows = ", ".join(
        f"('{s}', CAST({w!r} AS DOUBLE))" for s, w in shares.items()
    )
    bucket = (
        f"(CAST(('0x' || substr(sha256(CAST({key} AS VARCHAR)), 1, 7))"
        f" AS BIGINT) % {n_buckets})"
    )
    return f"""
WITH src AS ({table_sql}),
tgt(__src, __t) AS (VALUES {tgt_rows}),
cnts AS (SELECT {source_col} AS __src, count(*) AS __n FROM src GROUP BY 1),
j AS (SELECT * FROM cnts JOIN tgt USING (__src)),
c AS (SELECT min(__n / __t) AS __c FROM j),
thr AS (
    SELECT __src, floor(__c * __t / __n * {n_buckets}) AS __thr
    FROM j CROSS JOIN c
)
SELECT src.* FROM src JOIN thr ON src.{source_col} = thr.__src
WHERE {bucket} < thr.__thr
"""


def sample_negatives_hash(
    anchors: DataFrame,
    n_items: int | DataFrame,
    k: int = 4,
    anchor_col: str = "vec_id",
    exclude_pairs: DataFrame | None = None,
    exclude_a: str = "doc_a",
    exclude_b: str = "doc_b",
    oversample: int = 4,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training:
    (anchor, neg_id, probe) — ``k`` pseudo-random items per anchor,
    drawn by HASH PROBES instead of per-partition RNG, so the same
    negatives come back on any engine/partitioning/rerun (the property
    every sampler in this module guarantees).

    ``neg_id = sha256(anchor || '#' || j) % n_items`` for probe
    ``j = 0..k*oversample-1``; probes that hit the anchor itself or a
    pair in ``exclude_pairs`` (e.g. near-duplicate positives — either
    orientation) are discarded and the lowest-``probe`` ``k`` survivors
    win. IDs must be dense ``[0, n_items)`` (build one with
    ``row_number`` or ``epoch_shuffle_key`` otherwise).  ``n_items``
    may be a 1-row DataFrame with column ``n`` (e.g.
    ``items.agg(count(*).alias("n"))``) — folded in lazily as a
    broadcast scalar, no eager action at plan-build time.

    Scale shape: O(anchors x k x oversample) generated rows — never a
    cartesian candidate set; the exclusion is one (salted-able) join;
    the per-anchor rank is bounded by k*oversample rows. With the
    default oversample=4 the probability of returning fewer than k
    negatives is negligible for n_items >> k (collisions are ~k/n).
    """
    probes = anchors.select(F.col(anchor_col).alias("anchor")).select(
        "anchor",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(k * oversample) - 1))
        ).alias("probe"),
    )
    if isinstance(n_items, DataFrame):
        probes = probes.crossJoin(F.broadcast(n_items))
        n_mod = F.col("n")
    else:
        n_mod = F.lit(int(n_items))
    neg = F.pmod(
        F.conv(
            F.substring(
                F.sha2(
                    F.concat_ws("#", F.col("anchor").cast("string"),
                                F.col("probe").cast("string")),
                    256,
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long"),
        n_mod,
    )
    cand = probes.select("anchor", "probe", neg.alias("neg_id")).filter(
        F.col("neg_id") != F.col("anchor")
    )
    if exclude_pairs is not None:
        from multi_sensor_data_pipeline_for_robotics__spark.cache import (
            maybe_persist,
        )

        # persist before the orientation union: both union arms consume
        # the (possibly expensive) pair-generation subtree, which would
        # otherwise execute twice
        ex = maybe_persist(
            exclude_pairs.select(
                F.col(exclude_a).alias("xa"), F.col(exclude_b).alias("xb")
            )
        )
        ex = ex.unionAll(ex.select(F.col("xb").alias("xa"),
                                   F.col("xa").alias("xb"))).distinct()
        cand = cand.join(
            ex,
            (cand["anchor"] == ex["xa"]) & (cand["neg_id"] == ex["xb"]),
            "left_anti",
        )
    from pyspark.sql import Window as W

    ranked = cand.withColumn(
        "__rn",
        F.row_number().over(
            W.partitionBy("anchor").orderBy("probe", "neg_id")
        ),
    )
    return ranked.filter(F.col("__rn") <= k).select(
        "anchor", F.col("neg_id").cast("long").alias("neg_id"), "probe"
    )


def negatives_oracle_sql(
    anchors_sql: str,
    n_items: int | str,
    k: int = 4,
    oversample: int = 4,
    exclude_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`sample_negatives_hash`. ``anchors_sql``
    yields a column ``anchor``; ``exclude_sql`` (optional) yields
    (doc_a, doc_b) positive pairs. ``n_items`` may be a scalar-subquery
    string like ``"(SELECT count(*) FROM embeddings)"``."""
    ex = ""
    if exclude_sql is not None:
        ex = f""",
ex AS (
    SELECT doc_a AS xa, doc_b AS xb FROM ({exclude_sql})
    UNION SELECT doc_b, doc_a FROM ({exclude_sql})
)"""
    anti = (
        "AND NOT EXISTS (SELECT 1 FROM ex WHERE ex.xa = c.anchor"
        " AND ex.xb = c.neg_id)"
        if exclude_sql is not None
        else ""
    )
    return f"""
WITH a AS ({anchors_sql}),
probes AS (
    SELECT anchor, CAST(j AS INTEGER) AS probe
    FROM a, unnest(range({k * oversample})) AS t(j)
),
c AS (
    SELECT anchor, probe,
           CAST(('0x' || substr(sha256(CAST(anchor AS VARCHAR) || '#'
                                       || CAST(probe AS VARCHAR)), 1, 7))
                AS BIGINT) % {n_items} AS neg_id
    FROM probes
){ex},
kept AS (
    SELECT anchor, probe, neg_id,
           row_number() OVER (PARTITION BY anchor
                              ORDER BY probe, neg_id) AS rn
    FROM c
    WHERE neg_id != anchor {anti}
)
SELECT anchor, CAST(neg_id AS BIGINT) AS neg_id, probe
FROM kept WHERE rn <= {k}
"""


def contrastive_triplets(
    pairs: DataFrame,
    n_items: int | DataFrame,
    k: int = 2,
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    oversample: int = 4,
) -> DataFrame:
    """(anchor, positive, negative, probe) training triplets from mined
    near-duplicate ``pairs``: each pair (a, b) supplies the
    anchor/positive, and ``k`` deterministic hash-probe negatives per
    anchor attach via :func:`sample_negatives_hash` with the FULL pair
    set excluded in both orientations (a negative must not be any of
    the anchor's positives) — the standard triplet-loss data-prep
    composition, all from already-graded primitives.

    Scale shape: |pairs| + |anchors|·k·oversample generated rows, one
    exclusion join, one bounded per-anchor rank, one anchor join —
    never a cartesian stage. Deterministic on any engine/partitioning
    (pure hash probes, probe-order tie-break)."""
    anchors = pairs.select(F.col(pair_a).alias("anchor")).distinct()
    negs = sample_negatives_hash(
        anchors,
        n_items,
        k=k,
        anchor_col="anchor",
        exclude_pairs=pairs,
        exclude_a=pair_a,
        exclude_b=pair_b,
        oversample=oversample,
    )
    return (
        pairs.select(
            F.col(pair_a).alias("anchor"), F.col(pair_b).alias("positive")
        )
        .join(negs, "anchor")
        .select(
            "anchor", "positive", F.col("neg_id").alias("negative"), "probe"
        )
    )
