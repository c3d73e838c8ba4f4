"""Training-data export: deterministic shuffle-sharding, mixture
sampling, and small-file compaction.

The last mile of a 100 TB training pipeline: after dedup/filter/score,
the corpus must leave the engine as (a) a FIXED number of shards, (b)
in a globally shuffled but REPRODUCIBLE order (re-running the export
on the same corpus must byte-identically reproduce shard membership
and intra-shard order — resumable training depends on it), (c) with
per-source mixing weights applied. Random()-based shuffles fail (b);
everything here derives from a content hash instead.

Hash choice: the first 8 hex chars of sha256(key) parsed as an int in
[0, 2^32). sha256 is engine-portable (Spark `sha2(x, 256)` == DuckDB
`sha256(x)`), uniform, and key-stable — which is what makes the shard
assignment and the sampling decisions oracle-checkable SQL on BOTH
engines (registry queries ex_shard_assignment / ex_mixture_sample).

Scale shape: shard assignment is a narrow projection (no shuffle);
intra-shard ordering is a window partitioned BY SHARD (each shard
sorts independently — never a global sort); the physical write is one
partitioned write. Compaction is the standard maintenance pass over a
landing zone of many small files: one read, one repartition sized from
actual on-disk bytes, one write.

Reference parity: the reference exports per-file JSON artifacts to the
destination connector (destination.py:339-388) and has no corpus-level
export; sharded training export is beyond-reference north-star scope.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_u32(key: Column, salt: str = "") -> Column:
    """Deterministic uniform int in [0, 2^32) from a key column.

    First 8 hex chars of sha256(salt || key): reproducible across
    engines and runs, unlike `hash()` (Murmur3, Spark-private) or
    `rand()` (partition-order dependent).
    """
    s = F.concat(F.lit(salt), key.cast("string"))
    return F.conv(F.substring(F.sha2(s, 256), 1, 8), 16, 10).cast("long")


def deterministic_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every row a shard in [0, n_shards) and a dense position
    within its shard, in globally-shuffled-but-reproducible order.

    shard = hash % n_shards (membership), shard_pos = rank of
    (hash, id) within the shard (intra-shard shuffle order; the id
    tie-break makes the order total, so re-runs reproduce it exactly).
    The window partitions by shard — n_shards independent sorts, never
    one global sort.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = hash_u32(F.col(id_col), salt)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("shard_pos", F.row_number().over(w) - 1)
        .drop("_h")
    )


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-group deterministic sampling — the dataset-mixing knob.

    Keeps a row iff hash(id) < floor(fraction[group] * 2^32): each
    source is down-weighted to its configured rate, decisions are
    key-stable (a doc keeps/drops identically on every run and on
    every engine), and no shuffle happens — it's a pure filter, pushed
    down to the scan. Unlisted groups get `default_fraction`.
    """
    threshold = None
    for g, frac in fractions.items():
        t = int(min(max(frac, 0.0), 1.0) * 4294967296)
        cond = F.when(F.col(group_col) == g, F.lit(t))
        threshold = cond if threshold is None else threshold.when(
            F.col(group_col) == g, F.lit(t)
        )
    default_t = int(min(max(default_fraction, 0.0), 1.0) * 4294967296)
    threshold = (
        F.lit(default_t) if threshold is None else threshold.otherwise(F.lit(default_t))
    )
    return df.filter(hash_u32(F.col(id_col), salt) < threshold)


def pack_sequences(
    df: DataFrame,
    budget: int,
    len_col: str,
    id_col: str = "doc_id",
    n_shards: int = 1,
    salt: str = "",
) -> DataFrame:
    """Linear sequence packing: group rows into budget-sized packs —
    the batch-construction step that turns documents into fixed
    token-budget training examples.

    Rows are laid out in the deterministic shuffle order (hash, id)
    within each shard; a running length cumsum assigns
    pack_id = floor((cumsum - len) / budget): a row joins the pack
    where its span STARTS. Exact bin packing is NP-hard and
    order-unstable under parallelism; linear packing is the streaming
    packer every large trainer actually uses — one pass, deterministic,
    packs overshoot the budget by at most one row's tail. A row longer
    than the whole budget spans multiple boundaries and the next row
    starts a new pack, so giants never drag neighbors along.

    Scale shape: the window partitions by shard — n_shards independent
    cumsums, never a global sort. Output adds (shard, pack_id,
    pack_off) where pack_off is the row's start offset inside its
    shard's layout.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = hash_u32(F.col(id_col), salt)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(len_col)).over(w)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("pack_off", (cum - F.col(len_col)).cast("long"))
        .withColumn("pack_id", F.floor(F.col("pack_off") / budget).cast("long"))
        .drop("_h")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
    fmt: str = "parquet",
) -> None:
    """Physical sharded export: one directory per shard, rows stored in
    shard_pos order so a sequential reader streams the shuffled order.

    repartition on the shard column puts each shard's rows in one task;
    sortWithinPartitions orders them; partitionBy writes shard=N dirs.
    """
    sharded = deterministic_shards(df, n_shards, id_col, salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Compact a landing zone of many small files into size-targeted
    ones; returns the output file count.

    The small-files problem is the classic streaming-sink pathology
    (every micro-batch drop adds a file; a listing of 10M tiny files
    throttles every downstream scan). Output file count is sized from
    the source's ACTUAL on-disk bytes (via the input_file metadata of a
    distributed scan — no driver-side filesystem walk), then one
    repartition + write. Run it from the cron scheduler like any other
    maintenance pipeline.
    """
    df = spark.read.format(fmt).load(src_path)
    # distinct (file, size) over the scan's file metadata: distributed,
    # and exact for the bytes the compaction actually has to carry
    sizes = (
        df.select(
            F.col("_metadata.file_path").alias("f"),
            F.col("_metadata.file_size").alias("sz"),
        )
        .groupBy("f")
        .agg(F.first("sz").alias("sz"))
        .agg(F.sum("sz").alias("total"))
        .collect()
    )
    total_bytes = int(sizes[0]["total"] or 0)
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(dst_path)
    return n_files


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sample of exactly min(n, |stratum|)
    rows — the reservoir-sampling shape for corpus curation (balance
    sources/languages/length-buckets in an eval or seed set), made
    reproducible: keep the n smallest hash_u32 values per stratum
    instead of a random reservoir, so the sample is a pure function of
    (ids, salt) across runs AND engines.

    One shuffle (window per stratum); a hot stratum sorts only its own
    rows. Rank ties break on the id for full determinism.
    """
    h = hash_u32(F.col(id_col), salt)
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_h", "_rn")
    )


def length_mixture_plan(
    docs: DataFrame,
    budget_tokens: int = 100_000,
    text_col: str = "text",
) -> DataFrame:
    """Curriculum/length-mixture plan: bin documents by token length
    and allocate a training-token budget proportional to each bin's
    corpus share — the planning table a data-mixture config is tuned
    against (length buckets are the standard curriculum axis).

    Allocation stays in INTEGER arithmetic (budget * bin_tokens DIV
    corpus_tokens) so the plan is engine-portable; shares are rounded
    doubles for the human column. Two aggregations (per-bin, corpus
    total) + one broadcast join — no window, no Python.
    """
    from unstract_spark.operators.text_analysis import token_count_ws

    n = token_count_ws(F.col(text_col))
    binned = docs.select(
        F.when(n < 64, "s")
        .when(n < 256, "m")
        .when(n < 1024, "l")
        .otherwise("xl")
        .alias("length_bin"),
        n.alias("n_tokens"),
    )
    per = binned.groupBy("length_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
    # corpus total folds the 4-row per-bin aggregate — summing `binned`
    # again would re-scan and re-tokenize the whole corpus
    tot = per.agg(F.sum("bin_tokens").alias("corpus_tokens"))
    return per.crossJoin(F.broadcast(tot)).select(
        "length_bin",
        "n_docs",
        "bin_tokens",
        F.round(
            F.col("bin_tokens").cast("double") / F.col("corpus_tokens"), 6
        ).alias("token_share"),
        F.expr(f"{budget_tokens} * bin_tokens DIV corpus_tokens").alias(
            "budget_alloc"
        ),
    )


def segment_pieces(
    df: DataFrame,
    budget: int,
    len_col: str,
    id_col: str = "doc_id",
    n_shards: int = 1,
    salt: str = "",
) -> DataFrame:
    """Fixed-budget segment construction WITH document splitting — the
    step after pack_sequences that real pretraining packers run: the
    shard's concatenated token stream is cut into exact `budget`-sized
    segments, and a document spanning a cut contributes a PIECE to each
    segment it crosses (continuation pieces, piece_no > 0). Every
    segment is exactly full; nothing is padded or dropped.

    Pure integer arithmetic on the pack_sequences layout: a row at
    offset `off` with length `len` spans segments off DIV B ..
    (off+len-1) DIV B; its piece in segment s starts at
    max(0, s*B - off) inside the document and has length
    min(off+len, (s+1)*B) - max(off, s*B). Fan-out per row is
    ceil(len/B)+1 at worst — bounded by the row's own length, and the
    explode stays proportional to total corpus tokens / budget.
    Zero-length rows contribute no pieces.
    """
    packed = pack_sequences(
        df.filter(F.col(len_col) > 0), budget, len_col, id_col, n_shards, salt
    )
    b = int(budget)
    first = F.expr(f"pack_off DIV {b}")
    last = F.expr(f"(pack_off + {len_col} - 1) DIV {b}")
    off = F.col("pack_off")
    ln = F.col(len_col)
    seg = F.col("seg_id")
    return (
        packed.select(
            id_col,
            "shard",
            "pack_off",
            len_col,
            F.explode(F.sequence(first, last)).alias("seg_id"),
        )
        .select(
            F.col(id_col),
            F.col("shard"),
            seg.cast("long").alias("seg_id"),
            (seg - F.expr(f"pack_off DIV {b}")).cast("int").alias("piece_no"),
            F.greatest(seg * b - off, F.lit(0).cast("long")).alias(
                "piece_start"
            ),
            (
                F.least(off + ln, (seg + 1) * b)
                - F.greatest(off, seg * b)
            ).cast("long").alias("piece_len"),
        )
    )


def morton_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """Generated-SQL Morton (Z-order) interleave of two non-negative
    integer expressions: bit i of x lands at position 2i, bit i of y
    at 2i+1.  Emitted as a sum of disjoint single-bit terms, so the
    identical spelling runs on Spark and DuckDB (both speak >>, &,
    <<) and the value is integer-exact — the layout key IS gateable.
    """
    # every term fully parenthesized: DuckDB binds + TIGHTER than <<
    # (1 << 2 + 3 parses as 1 << 5), so a bare `a << i + b << j` chain
    # nests the shifts instead of summing them
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_sql}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_sql}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 8,
    out_col: str = "zorder",
) -> DataFrame:
    """Multi-dimensional clustering for data skipping (the Delta
    OPTIMIZE ZORDER BY idea): add the Morton key over two columns and
    range-partition + sort by it, so each written file covers a small
    BOUNDING BOX in (x, y) — parquet min/max stats then prune files
    for predicates on EITHER column, which a single-column sort only
    gives you for that one column.  Purely a layout transform: row
    content is untouched; write the result with .write.parquet and
    the skipping comes from the stats the layout produces."""
    z = F.expr(morton_sql(x_col, y_col, bits)).alias(out_col)
    return (
        df.withColumn(out_col, z)
        .repartitionByRange(n_files, F.col(out_col))
        .sortWithinPartitions(out_col)
    )


def compaction_plan(
    files: DataFrame,
    id_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Metadata-only COMPACTION PLAN: assign each input file to an
    output bin of ~target_bytes by sequential fill in id order — the
    planning half of small-files maintenance (what table formats
    compute before any rewrite I/O; compact_small_files above is the
    physical half with a single global size). Per-file granularity
    lets the executor schedule one rewrite task per bin and skip bins
    that are already a single file.

    Bin rule: a file starts in bin floor(cum_before / target_bytes),
    where cum_before is the byte sum of all earlier files (id order).
    A file straddling a boundary stays in the earlier bin and may
    overflow it by one file — the same convention as Spark's own file
    coalescing (maxPartitionBytes packing). Deterministic, exact
    integer arithmetic end to end.

    Scale shape: the running sum uses ranks.range_prefix (two-pass
    distributed prefix sum) — NO single-partition window; a 10M-file
    listing plans across the cluster. Output: (id, bytes, bin_id).
    """
    from unstract_spark.operators.ranks import range_prefix

    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    base = files.select(
        F.col(id_col).alias("fid"), F.col(size_col).cast("long").alias("sz")
    )
    pre = range_prefix(base, ["fid"], ("sz",), rank_col=None)
    return pre.select(
        F.col("fid").alias(id_col),
        F.col("sz").alias("bytes"),
        F.expr(f"(cum_sz - sz) div {int(target_bytes)}").alias("bin_id"),
    )


def hilbert_distance(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "hilbert",
) -> DataFrame:
    """Hilbert-curve distance of (x, y) — the space-filling curve
    with strictly better locality than Morton (adjacent curve
    positions are ALWAYS adjacent cells; Z-order jumps across the
    plane at quadrant seams), which is why table formats grew
    OPTIMIZE ... HILBERT alongside ZORDER.

    The classic xy2d walk (quadrant digit + rotate/reflect per
    level) is unrolled at plan-build time into `bits` successive
    integer-CASE projections — pure +, &, CASE on BIGINTs, no UDF,
    Catalyst collapses the chain into one codegen stage. The twin
    CTE chain `_hilbert_oracle_sql` below is generated from the SAME
    loop, so every level's reflect/swap is cross-engine gateable.

    Inputs must already be in [0, 2^bits); mask upstream.
    """
    out = df.withColumn("_hx", F.col(x_col).cast("long")).withColumn(
        "_hy", F.col(y_col).cast("long")
    ).withColumn("_hd", F.lit(0).cast("long"))
    for s in [1 << i for i in range(bits - 1, -1, -1)]:
        rx = (F.col("_hx").bitwiseAND(F.lit(s)) > 0).cast("long")
        ry = (F.col("_hy").bitwiseAND(F.lit(s)) > 0).cast("long")
        quad = (
            F.when((rx == 0) & (ry == 0), F.lit(0))
            .when(rx == 0, F.lit(1))
            .when(ry == 0, F.lit(3))
            .otherwise(F.lit(2))
        )
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
                F.col("_hy")
            ),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
                F.col("_hx")
            ),
        ).otherwise(F.col("_hy"))
        out = (
            out.withColumn("_hd2", F.col("_hd") + F.lit(s * s) * quad)
            .withColumn("_hx2", nx)
            .withColumn("_hy2", ny)
            .drop("_hd", "_hx", "_hy")
            .withColumnRenamed("_hd2", "_hd")
            .withColumnRenamed("_hx2", "_hx")
            .withColumnRenamed("_hy2", "_hy")
        )
    return out.withColumnRenamed("_hd", out_col).drop("_hx", "_hy")


def hilbert_oracle_sql(
    x_sql: str, y_sql: str, source_sql: str, bits: int = 8
) -> str:
    """The DuckDB twin of hilbert_distance: the same per-level
    reflect/swap walk as chained CTEs, generated by the same loop —
    returns a query text whose single output column is `hilbert`."""
    ctes = [
        f"h0 AS (SELECT CAST({x_sql} AS BIGINT) AS x,"
        f" CAST({y_sql} AS BIGINT) AS y,"
        f" CAST({x_sql} AS BIGINT) AS x0,"
        f" CAST({y_sql} AS BIGINT) AS y0,"
        f" CAST(0 AS BIGINT) AS d FROM {source_sql})"
    ]
    lvl = 0
    for s in [1 << i for i in range(bits - 1, -1, -1)]:
        p, n = f"h{lvl}", f"h{lvl + 1}"
        quad = (
            f"CASE WHEN (x & {s}) = 0 AND (y & {s}) = 0 THEN 0"
            f" WHEN (x & {s}) = 0 THEN 1"
            f" WHEN (y & {s}) = 0 THEN 3 ELSE 2 END"
        )
        nx = (
            f"CASE WHEN (y & {s}) = 0 THEN"
            f" (CASE WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END)"
            f" ELSE x END"
        )
        ny = (
            f"CASE WHEN (y & {s}) = 0 THEN"
            f" (CASE WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END)"
            f" ELSE y END"
        )
        ctes.append(
            f"{n} AS (SELECT {nx} AS x, {ny} AS y, x0, y0,"
            f" d + {s * s} * ({quad}) AS d FROM {p})"
        )
        lvl += 1
    # x0/y0 carry the ORIGINAL coordinates through the walk (the
    # rotations consume x/y) for consumers that need (point, distance)
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT x0, y0, d AS hilbert FROM h{lvl}"
    )
