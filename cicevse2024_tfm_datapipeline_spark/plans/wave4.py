"""Round-3 wave 4: set-similarity join via prefix filtering (PPJoin-style),
bounded BFS over the dedup graph, referential-integrity auditing,
reciprocal-rank fusion, Benford first-digit profiling, and exact integer
CUSUM change-point scoring.

Scale extensions beyond the reference pipeline surface (no reference twin;
the reference is a single-machine pandas/sklearn TFM pipeline) — each is a
standard large-corpus / data-quality primitive re-expressed as Spark
relational algebra with a DuckDB oracle twin.

Determinism contracts follow the house rules (plans/tpch_suite.py header):
threshold compares happen on integers (2·inter ≥ union for Jaccard ≥ 0.5;
n·prefix − i·total for CUSUM), ranks come from integer row numbers, and
every emitted float is either a single division of exact integers or a
``pround`` of an identically-derived double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.extensions import (
    BANDS,
    NUM_HASHES,
    _band_sql,
    _PR_EDGES,
    _sig_sql,
    _SHINGLES3,
    _TOKS,
)
from cicevse2024_tfm_datapipeline_spark.plans.registry import register


# ---------------------------------------------------------------------------
# Prefix-filter exact set-similarity join (PPJoin-lite), τ = 0.5
# ---------------------------------------------------------------------------

_SH_SETS = f"""
    toksd AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    shs AS (
        SELECT doc_id, unnest(list_distinct({_SHINGLES3})) AS shingle_s
        FROM toksd
    ),
    sh AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(shingle_s), 1, 15)) AS BIGINT) AS shingle
        FROM shs
    )
"""


@register(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH {_SH_SETS},
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    ranked AS (
        SELECT s.doc_id, s.shingle,
               row_number() OVER (PARTITION BY s.doc_id
                                  ORDER BY d.df ASC, s.shingle ASC) AS pos,
               count(*) OVER (PARTITION BY s.doc_id) AS n
        FROM sh s JOIN dfreq d USING (shingle)
    ),
    pref AS (SELECT * FROM ranked WHERE pos <= n - floor((n + 1) / 2.0) + 1),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pref a JOIN pref b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         AND 2 * least(a.n, b.n) >= greatest(a.n, b.n)
         AND 1 + least(a.n - a.pos, b.n - b.pos)
             >= floor((a.n + b.n + 2) / 3.0)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS n_inter
        FROM cand c
        JOIN sh fa ON fa.doc_id = c.doc_a
        JOIN sh fb ON fb.doc_id = c.doc_b AND fb.shingle = fa.shingle
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           round(i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE 2 * i.n_inter >= sa.n + sb.n - i.n_inter
    """,
    doc="Exact set-similarity self-join via prefix filtering (PPJoin "
    "family): order each doc's 3-shingle set by ascending global document "
    "frequency (rarest first), keep only the first n − ⌈τ·n⌉ + 1 shingles "
    "as the prefix, and generate candidates by equi-joining on PREFIX "
    "shingles only — the filter is lossless for Jaccard ≥ τ (two sets "
    "meeting the threshold must overlap within these prefixes), and "
    "rare-first ordering makes the candidate join keys near-unique, so "
    "the join is skew-free where a full inverted index would hot-spot on "
    "common shingles. The length filter (2·min(n_a,n_b) ≥ max — a "
    "necessary condition for J ≥ 0.5) prunes candidates before the "
    "exact intersection-count verify join. Complements MinHash-LSH "
    "(probabilistic, false negatives possible) with an EXACT near-dup "
    "join at the same equi-join scale shape; candidate volume tracks "
    "corpus shingle density, which this closed-vocabulary synthetic "
    "corpus maximizes. The τ = 0.5 acceptance is the integer compare "
    "2·|∩| ≥ |∪| and the prefix length uses floor((n+1)/2.0) — no float "
    "threshold can flip membership between engines.",
    tags=("dedup", "jaccard", "prefix-filter"),
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import (
        tokens_expr,
        word_shingles_expr,
    )

    # wide=True: the tokenize→shingle→explode chain below is the CPU-dense
    # narrow stage the split-starved-scan mitigation exists for (measured
    # 4.8 → 1.9 s at sf0.1; the later repartition only parallelizes what
    # comes AFTER the explode)
    docs = t(spark, sf_dir, "documents", wide=True)
    # shingle strings collapse to 60-bit md5-prefix BIGINTs (same mapping
    # in the oracle) BEFORE any shuffle: every downstream join/window key
    # moves 8 bytes instead of a 3-word string. A collision would merge
    # the same pair of shingles in BOTH engines, so the contract holds
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles_expr(tokens_expr(F.col("text")), 3))
        ).alias("shingle_s"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle_s"), 1, 15), 16, 10)
        .cast("long")
        .alias("shingle"),
    )
    # multi-consumer (dfreq, ranked, sizes, two verify probes) — pin the
    # exploded set frame so the tokenize→shingle chain runs once. The
    # repartition is the parallelism floor: the source is a handful of
    # parquet files, and without an exchange the pinned frame (and every
    # stage downstream of it) inherits that near-serial partitioning.
    # The EXPLICIT count keeps AQE from coalescing the floor away
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sh = sh.repartition(n_parts, "doc_id").localCheckpoint(eager=False)
    # r12 (guide §2.4, the r11 tfidf pattern re-proven by this round's
    # paired A/B): the global document frequency is the row count of a
    # shingle's partition in sh — an unbounded-frame window count over
    # shingle replaces the former df groupBy + join-back, which
    # re-shuffled the corpus-sized exploded frame TWICE on the shingle
    # key (once to aggregate, once to probe the join). Identical df
    # values by definition (the join was inner on a key every sh row
    # has); one shingle exchange instead of two.
    wpos = W.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    ranked = (
        sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
        .withColumn("pos", F.row_number().over(wpos))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
    )
    # two consumers (both sides of the candidate self-join) — pin, or the
    # dfreq-join + double-window subtree executes once per side
    pref = ranked.filter(
        F.col("pos") <= F.col("n") - F.floor((F.col("n") + 1) / F.lit(2.0)) + 1
    ).localCheckpoint(eager=False)
    pa = pref.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("pos").alias("posa"),
        "shingle",
    )
    pb = pref.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("pos").alias("posb"),
        "shingle",
    )
    # length filter (J >= 0.5 forces the smaller set to be at least half
    # the larger) + PPJoin positional filter (the remaining capacity past
    # this prefix position must still reach the overlap floor
    # ceil((na+nb)/3) that J >= 0.5 implies) — both lossless, together
    # they drop ~60% of candidates before the verify join
    cand = (
        pa.join(pb, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (2 * F.least("na", "nb") >= F.greatest("na", "nb"))
            & (
                1
                + F.least(F.col("na") - F.col("posa"), F.col("nb") - F.col("posb"))
                >= F.floor((F.col("na") + F.col("nb") + 2) / F.lit(3.0))
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # the verify join EXPANDS each candidate pair by ~|set| rows before
    # the pair-intersection aggregate collapses it back. AQE sizes the
    # stage from the (tiny) candidate input and coalesces it near-serial;
    # the explicit partition count pins the expansion's parallelism
    cand = cand.repartition(n_parts, "doc_a")
    # verify WITHOUT re-exploding: each doc's set rides as ONE sorted
    # array row; the intersection is a codegen'd array_intersect per
    # candidate pair. Same shuffled bytes as the explode-join verify but
    # no |pair|x|set| intermediate and no pair-key hash aggregation —
    # measured ~4x less executor CPU at sf0.1
    sets = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"), F.col("n").alias("n_a")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"), F.col("n").alias("n_b")
    )
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("ss_a", "ss_b")).cast("long"))
    )
    return (
        scored.filter(
            2 * F.col("n_inter") >= F.col("n_a") + F.col("n_b") - F.col("n_inter")
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_inter"),
            pround(
                F.col("n_inter")
                * F.lit(1.0)
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Bounded BFS levels over the LSH candidate graph
# ---------------------------------------------------------------------------


@register(
    "g_bfs_levels_lsh",
    oracle=f"""
    WITH RECURSIVE {_sig_sql()},
    bands AS ({_band_sql()}),
    {_PR_EDGES},
    seed AS (SELECT min(src) AS node FROM edges),
    walk(node, lvl) AS (
        SELECT node, 0 FROM seed
        UNION
        SELECT e.dst, w.lvl + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.lvl < 4
    )
    SELECT node, CAST(min(lvl) AS BIGINT) AS level
    FROM walk GROUP BY node
    """,
    doc="Breadth-first levels from the minimum-id node over the MinHash-"
    "LSH candidate graph, unrolled to depth 4 (operators/graph."
    "bfs_levels): per round one frontier⋈edges equi-join + one anti-join "
    "against the visited set — the hop-distance primitive for duplicate-"
    "cluster neighborhoods (level = how many near-dup links separate a "
    "doc from the seed). Fixing the depth makes the traversal pure "
    "relational algebra, verified against a DuckDB recursive CTE whose "
    "min(lvl) per node is the same first-visit BFS distance. Dedup "
    "graphs have 2-4 hop diameters, so the bound covers the component; "
    "frontiers are lazily checkpointed to stop per-consumer re-execution "
    "of the round subtrees.",
    tags=("graph", "bfs", "dedup"),
)
def g_bfs_levels_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.dedup import lsh_candidate_pairs
    from cicevse2024_tfm_datapipeline_spark.operators.graph import bfs_levels, undirect

    docs = t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, "text", "doc_id", NUM_HASHES, BANDS, 3)
    edges = undirect(pairs).localCheckpoint(eager=False)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    mn = nodes.agg(F.min("node").alias("__mn"))
    seed = (
        nodes.crossJoin(F.broadcast(mn))
        .filter(F.col("node") == F.col("__mn"))
        .select("node")
    )
    return bfs_levels(edges, seed, max_depth=4)


# ---------------------------------------------------------------------------
# Referential-integrity audit across the warehouse FK graph
# ---------------------------------------------------------------------------


@register(
    "a_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS check_name,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    """,
    doc="Referential-integrity audit over the star schema's FK edges: "
    "each check is a left-anti join (child minus parent keys) reduced to "
    "an orphan count, unioned into one summary frame — the standard "
    "pre-training data-quality gate for warehouse extracts. Parent key "
    "sets broadcast (dims) or shuffle once on the key (orders); each "
    "anti-join prunes the child scan to its single FK column, so the "
    "audit reads each fact column exactly once.",
    tags=("A", "quality", "anti"),
)
def a_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")

    def orphans(child: DataFrame, key, parent: DataFrame, pkey, label: str) -> DataFrame:
        return (
            child.select(key)
            .join(parent.select(pkey), F.col(key) == F.col(pkey), "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            .select(F.lit(label).alias("check_name"), "n_orphans")
        )

    checks = [
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders"),
        orphans(li, "l_partkey", t(spark, sf_dir, "part"), "p_partkey", "lineitem->part"),
        orphans(
            li, "l_suppkey", t(spark, sf_dir, "supplier"), "s_suppkey", "lineitem->supplier"
        ),
        orphans(
            orders, "o_custkey", t(spark, sf_dir, "customer"), "c_custkey", "orders->customer"
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of two document rankings
# ---------------------------------------------------------------------------


@register(
    "sim_rrf_fusion",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               len({_TOKS}) AS n_toks,
               len(list_distinct({_TOKS})) AS n_distinct
        FROM documents
    ),
    nonempty AS (SELECT * FROM feats WHERE n_toks > 0),
    ranked AS (
        SELECT doc_id, n_toks, n_distinct,
               row_number() OVER (ORDER BY n_toks DESC, doc_id DESC) AS r_len,
               row_number() OVER (ORDER BY n_distinct * 1.0 / n_toks DESC,
                                  doc_id DESC) AS r_div
        FROM nonempty
    ),
    fused AS (
        SELECT doc_id, CAST(r_len AS BIGINT) AS r_len,
               CAST(r_div AS BIGINT) AS r_div,
               1.0 / (60 + r_len) + 1.0 / (60 + r_div) AS rrf
        FROM ranked
    )
    SELECT doc_id, r_len, r_div, round(rrf, 6) AS rrf_score
    FROM fused
    ORDER BY rrf DESC, doc_id ASC
    LIMIT 25
    """,
    doc="Reciprocal-rank fusion (k=60) of two retrieval signals — token "
    "count and lexical diversity (distinct/total token ratio) — the "
    "standard way to combine heterogeneous rankers (BM25 + dense ANN in "
    "production) without score calibration. Each global ranking comes "
    "from operators/scan.global_row_number (range-bucketed two-phase row "
    "numbers — no unpartitioned window), the fusion is one doc_id join, "
    "and the top-25 cut is a TakeOrderedAndProject heap. RRF scores "
    "derive from integer ranks via identical literal arithmetic, so "
    "ordering and the cut boundary agree across engines; doc_id breaks "
    "ties.",
    tags=("similarity", "fusion", "ranking"),
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.scan import global_row_number
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr
    from cicevse2024_tfm_datapipeline_spark.operators.topk import top_k

    docs = t(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.size(tokens_expr(F.col("text"))).alias("n_toks"),
        F.size(F.array_distinct(tokens_expr(F.col("text")))).alias("n_distinct"),
    ).filter(F.col("n_toks") > 0)
    # two global rankings → two range scans over the same tiny feature
    # frame; pin it so the tokenize projection runs once
    feats = feats.localCheckpoint(eager=False)
    r1 = global_row_number(
        feats.select("doc_id", "n_toks"), ["n_toks", "doc_id"], "r_len", descending=True
    ).select("doc_id", F.col("r_len").cast("long").alias("r_len"))
    r2 = global_row_number(
        feats.select(
            "doc_id", (F.col("n_distinct") * F.lit(1.0) / F.col("n_toks")).alias("__div")
        ),
        ["__div", "doc_id"],
        "r_div",
        descending=True,
    ).select("doc_id", F.col("r_div").cast("long").alias("r_div"))
    fused = r1.join(r2, "doc_id").withColumn(
        "rrf",
        F.lit(1.0) / (F.lit(60) + F.col("r_len"))
        + F.lit(1.0) / (F.lit(60) + F.col("r_div")),
    )
    top = top_k(fused, [F.desc("rrf"), F.asc("doc_id")], 25)
    return top.select(
        "doc_id", "r_len", "r_div", pround(F.col("rrf"), 6).alias("rrf_score")
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit on order totals
# ---------------------------------------------------------------------------

_BENFORD = {
    1: 0.301030,
    2: 0.176091,
    3: 0.124939,
    4: 0.096910,
    5: 0.079181,
    6: 0.066947,
    7: 0.057992,
    8: 0.051153,
    9: 0.045757,
}

_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD.items()
) + " END"


@register(
    "a_benford_first_digit",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        FROM orders WHERE o_totalprice > 0
    ),
    digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM cents
    ),
    hist AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS total FROM hist)
    SELECT digit, n,
           round(n * 1.0 / total, 6) AS obs_freq,
           round({_BENFORD_SQL_CASE}, 6) AS benford_freq,
           round(pow(n - ({_BENFORD_SQL_CASE}) * total, 2)
                 / (({_BENFORD_SQL_CASE}) * total), 4) AS chi2_term
    FROM hist, tot
    """,
    doc="Benford first-significant-digit audit on order totals — the "
    "classic fabricated-data screen for financial columns: histogram the "
    "leading digit, compare to the Benford expectation log10(1+1/d), "
    "emit per-digit chi-square contributions. The digit is extracted "
    "from the DECIMAL STRING of exact half-up cents (both engines print "
    "a BIGINT identically) — never from float log10, whose boundary "
    "behavior at powers of ten is engine-specific. One map-side-combined "
    "9-bucket aggregation; expectation constants are shared 6-dp "
    "literals so every derived double matches bitwise.",
    tags=("A", "quality", "benford"),
)
def a_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    hist = (
        orders.select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = hist.agg(F.sum("n").alias("total"))
    bexp = F.create_map(
        *[F.lit(x) for d, p in _BENFORD.items() for x in (d, p)]
    )[F.col("digit")]
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            pround(F.col("n") * F.lit(1.0) / F.col("total"), 6).alias("obs_freq"),
            pround(bexp, 6).alias("benford_freq"),
            pround(
                F.pow(F.col("n") - bexp * F.col("total"), F.lit(2.0))
                / (bexp * F.col("total")),
                4,
            ).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# Exact integer CUSUM change-point per user
# ---------------------------------------------------------------------------


@register(
    "a_cusum_changepoint",
    oracle="""
    WITH scaled AS (
        SELECT user_id, event_id, ts,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    cum AS (
        SELECT user_id, event_id,
               sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prefix,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS i,
               sum(v) OVER (PARTITION BY user_id) AS total,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM scaled
    ),
    dev AS (
        SELECT user_id, event_id, n,
               abs(n * prefix - i * total) AS abs_d
        FROM cum WHERE n >= 20
    ),
    best AS (
        SELECT user_id, event_id, n, abs_d,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY abs_d DESC, event_id ASC) AS rk
        FROM dev
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           event_id AS changepoint_event_id,
           round(abs_d / (10000.0 * n), 6) AS max_abs_cusum
    FROM best WHERE rk = 1
    """,
    doc="CUSUM change-point scoring per user: the maximum absolute "
    "deviation of the running sum from the fitted mean line, the "
    "standard offline change-detection statistic (a drifted segment "
    "pulls the cumulative sum away from n·mean·t). Computed EXACTLY in "
    "integers: with v scaled to 1e-4 ticks, n·prefix_i − i·total is the "
    "CUSUM times n — no float accumulation anywhere, so the argmax row "
    "(tie-broken by event_id) is engine-independent; the single closing "
    "division rescales to value units. All windows partition by user_id "
    "(bounded per-user history), one shuffle total.",
    tags=("A", "timeseries", "changepoint"),
)
def a_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias("v"),
    )
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    wall = W.partitionBy("user_id")
    cum = ev.select(
        "user_id",
        "event_id",
        F.sum("v").over(worder.rowsBetween(W.unboundedPreceding, 0)).alias("prefix"),
        F.row_number().over(worder).alias("i"),
        F.sum("v").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    dev = cum.filter(F.col("n") >= 20).select(
        "user_id",
        "event_id",
        "n",
        F.abs(F.col("n") * F.col("prefix") - F.col("i") * F.col("total")).alias(
            "abs_d"
        ),
    )
    wbest = W.partitionBy("user_id").orderBy(F.col("abs_d").desc(), F.col("event_id").asc())
    return (
        dev.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            F.col("event_id").alias("changepoint_event_id"),
            pround(F.col("abs_d") / (F.lit(10000.0) * F.col("n")), 6).alias(
                "max_abs_cusum"
            ),
        )
    )
