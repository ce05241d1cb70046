"""Edge semantics for late-wave operators (rounds 3+: SemDeDup,
gap-fill interpolation, CMS probes, wave42 Wasserstein/levenshtein,
wave43 URL canonicalization / suffix-LCP) — the degenerate shapes and
algebraic contracts (empty cells, singleton series, idempotence,
monotonicity) that sf-scale selfcheck rows can't distinguish."""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "id long, v array<double>")


def test_semdedup_singleton_cells_and_exact_dups(spark):
    """A cell with one member has no duplicates; exact duplicate vectors
    (cosine 1.0) collapse to the lowest id; near-orthogonal members all
    survive."""
    from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
        semdedup_marks,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),   # centroid 0
        (1, [0.0, 1.0, 0.0]),   # centroid 1
        (10, [1.0, 0.01, 0.0]),  # cell 0, dup of 11? no: dup of 0? id 0 is ALSO a member
        (11, [1.0, 0.01, 0.0]),  # exact dup of 10 -> removed (10 < 11)
        (12, [0.0, 0.0, 9.0]),   # alone in whichever cell it lands -> survives
    ]
    cents = _emb_df(spark, rows[:2]).select(
        F.col("id").cast("int").alias("cell"), F.col("v").alias("centroid")
    )
    marks = semdedup_marks(_emb_df(spark, rows), "id", "v", cents, threshold=0.95)
    got = {r["id"]: r["is_duplicate"] for r in marks.collect()}
    assert got[0] == 0          # lowest id in its cell always survives
    assert got[10] == 1         # cos(10, 0) ~ 0.9999 >= 0.95 -> removed
    assert got[11] == 1         # exact dup of 10 (and of 0)
    assert got[12] == 0         # isolated direction survives
    assert len(got) == 5


def test_semdedup_empty_input(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
        semdedup_marks,
    )

    cents = _emb_df(spark, [(0, [1.0, 0.0])]).select(
        F.col("id").cast("int").alias("cell"), F.col("v").alias("centroid")
    )
    empty = _emb_df(spark, []).filter("id > 0")
    assert semdedup_marks(empty, "id", "v", cents, 0.5).count() == 0


def test_gap_fill_edge_carry_and_singleton(spark):
    """A leading gap carries the NEXT known value backward, a trailing
    gap carries the PREVIOUS forward, an interior gap interpolates
    linearly; a single-point series has a 1-slot grid and no fills.
    Mirrors the w_gap_fill_interpolate plan on a hand-checked frame."""
    from pyspark.sql import Window

    rows = [
        # user 1: known at hr 10 (v=10.0) and hr 14 (v=30.0)
        (1, 10, 10.0),
        (1, 14, 30.0),
        # user 2: single point
        (2, 100, 7.0),
    ]
    b = spark.createDataFrame(rows, "user_id long, hr long, v double")
    bounds = b.groupBy("user_id").agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = bounds.select("user_id", F.explode(F.sequence("h0", "h1")).alias("hr"))
    j = grid.join(b, ["user_id", "hr"], "left")
    w_prev = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_next = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        0, Window.unboundedFollowing
    )
    known_hr = F.when(F.col("v").isNotNull(), F.col("hr"))
    f = j.select(
        "user_id",
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(known_hr, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(known_hr, ignorenulls=True).over(w_next).alias("nh"),
    )
    iv = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("hr") - F.col("ph"))
            / (F.col("nh") - F.col("ph"))
        )
    )
    got = {
        (r["user_id"], r["hr"]): r["iv"]
        for r in f.withColumn("iv", iv).collect()
    }
    assert got[(1, 10)] == 10.0
    assert got[(1, 11)] == 15.0
    assert got[(1, 12)] == 20.0
    assert got[(1, 13)] == 25.0
    assert got[(1, 14)] == 30.0
    assert got[(2, 100)] == 7.0
    assert len(got) == 6


def test_cms_estimate_dominates_exact(spark):
    """The count-min guarantee on the registered query itself: estimate
    >= exact for every probe, including absent tokens (exact 0)."""
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    rows = load_all()["a_countmin_heavy_hitters"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "no probe rows"
    by_tok = {r["token"]: r for r in rows}
    assert "zebra" in by_tok and by_tok["zebra"]["exact_count"] == 0
    for r in rows:
        assert r["cms_estimate"] >= r["exact_count"], r
        assert r["overcount"] == r["cms_estimate"] - r["exact_count"]


def test_knn_majority_tiebreak_deterministic(spark):
    """Vote ties break to the smaller label — pinned so the oracle and
    engine can never disagree on a 50/50 neighborhood."""
    from pyspark.sql import Window

    votes = spark.createDataFrame(
        [(1, 3, 2), (1, 7, 2), (2, 5, 5)], "query_id long, nbr_label int, n long"
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n"), F.asc("nbr_label"))
    pred = (
        votes.withColumn("pr", F.row_number().over(wv))
        .filter("pr = 1")
        .select("query_id", "nbr_label")
    )
    got = {r["query_id"]: r["nbr_label"] for r in pred.collect()}
    assert got == {1: 3, 2: 5}


def test_bpe_merge_rule_hand_checked(spark):
    """Two BPE rounds on a 3-word dictionary, fully hand-derived:
    corpus = 'ab ab abc' -> words {ab:2, abc:1}.
    Round 1 pairs: ('a b', 3) -> merge 'a b' -> {ab:2, ab c:1}.
    Round 2 pairs: ('ab c', 1) -> merge -> all single symbols.
    Total symbols after: 2*1 + 1*1 = 3."""
    import cicevse2024_tfm_datapipeline_spark.plans.extensions as ext
    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from unittest.mock import patch

    docs = spark.createDataFrame(
        [(0, "ab ab abc")], "doc_id long, text string"
    )
    with patch.object(ext, "t", lambda _s, _d, _n: docs):
        out = {
            r["round"]: (r["merged_pair"], r["pair_count"], r["total_symbols_after"])
            for r in ext.text_bpe_vocab_induction(spark, "unused").collect()
        }
    assert out[1] == ("a b", 3, 3)
    assert out[2] == ("ab c", 1, 3)


def test_clamped_cumsum_reflection_identity(spark):
    """The windowed closed form clamped_i = run_sum_i - min(0,
    running_min(run_sum)) must equal the sequential fold
    c_i = max(0, c_{i-1} + delta_i) on random delta sequences — the
    identity w_clamped_running_balance rests on."""
    import random as _r

    from pyspark.sql import Window

    rng = _r.Random(99)
    rows = []
    for g in range(6):
        for i in range(200):
            rows.append((g, i, rng.randint(-9, 9)))
    df = spark.createDataFrame(rows, "g int, i int, delta long")
    w = Window.partitionBy("g").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = (
        df.withColumn("rs", F.sum("delta").over(w))
        .withColumn("rm", F.min("rs").over(w))
        .withColumn("bal", F.col("rs") - F.least(F.lit(0).cast("long"), F.col("rm")))
    )
    got = {(r["g"], r["i"]): r["bal"] for r in out.collect()}
    for g in range(6):
        c = 0
        for i in range(200):
            c = max(0, c + rows[g * 200 + i][2])
            assert got[(g, i)] == c, (g, i)


def test_wasserstein_hand_checked_and_scipy_free(spark, tmp_path):
    """wave42 a_wasserstein_drift's arithmetic on a hand-computed case:
    A = {1, 2}, B = {2, 4} (as 2dp values) -> W1 = integral of |F_A-F_B|:
    segment [1,2): |1/2 - 0| = .5 x 1; [2,3): |1 - 1/2| = .5 x 1;
    [3,4): same as [2,4) continues -> |1 - 1/2| = .5 x 2 total from 2 to 4.
    W1 = 0.5*1 + 0.5*2 = 1.5."""
    import duckdb

    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    rows = [
        (1, "view", 1.00),
        (2, "view", 2.00),
        (3, "error", 2.00),
        (4, "error", 4.00),
        (5, "click", 99.0),  # filtered out by the query
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    # satisfy the loader's table layout for the other names it may touch
    out = load_all()["a_wasserstein_drift"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert abs(r["w1_distance"] - 1.5) < 1e-9
    # and the oracle SQL agrees on the same parquet
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; duckdb reads the part files
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    o = con.execute(load_all()["a_wasserstein_drift"].oracle).fetchone()
    assert abs(o[0] - 1.5) < 1e-9


def test_url_canonicalizer_hand_checked(spark):
    """wave43 canonicalize_url on adversarial URLs the fixture never
    produces: mixed-case scheme/host, default vs non-default ports,
    duplicate slashes, /index.html, tracking-only query strings, param
    reordering, a wwwx host that must NOT lose its prefix."""
    from cicevse2024_tfm_datapipeline_spark.plans.wave43 import canonicalize_url

    cases = [
        (
            "HTTPS://WWW.Foo.Example.COM:443/a//b/index.html?utm_source=x&z=1&a=2#f",
            "https://foo.example.com/a/b?a=2&z=1",
            "foo.example.com",
        ),
        ("http://foo.example.com:80/", "http://foo.example.com/", "foo.example.com"),
        ("https://foo.example.com", "https://foo.example.com/", "foo.example.com"),
        (
            "https://foo.example.com/x/?utm_campaign=only",
            "https://foo.example.com/x",
            "foo.example.com",
        ),
        (
            "http://foo.example.com:8080/x",  # non-default port survives
            "http://foo.example.com:8080/x",
            "foo.example.com:8080",
        ),
        ("https://wwwx.example.com/p", "https://wwwx.example.com/p", "wwwx.example.com"),
        (
            "https://www.foo.example.com/index.html",
            "https://foo.example.com/",
            "foo.example.com",
        ),
        (
            "https://foo.example.com/p?fbclid=abc&b=1&gclid=z",
            "https://foo.example.com/p?b=1",
            "foo.example.com",
        ),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    cu, h = canonicalize_url(F.col("url"))
    got = df.select("url", cu.alias("c"), h.alias("h")).collect()
    exp = {u: (c, hh) for u, c, hh in cases}
    assert len(got) == len(cases)
    for r in got:
        assert (r["c"], r["h"]) == exp[r["url"]], (r["url"], r["c"], r["h"])


def test_suffix_lcp_hand_checked(spark):
    """wave43 dedup_suffix_lcp_histogram vs a brute-force sequential
    reference with identical semantics (capped suffixes, joined-string
    sort order, adjacent LCP, >=5 filter): an exact-duplicate doc pair
    plus a 6-token shared run must produce exactly the reference
    histogram, max LCP = the 8-token full duplicate."""
    from unittest.mock import patch

    import cicevse2024_tfm_datapipeline_spark.plans.wave43 as w43

    texts = [
        (0, "p q r s t u v w"),
        (1, "m n p q r s t u z"),  # shares the 6-token run "p q r s t u"
        (2, "p q r s t u v w"),  # exact duplicate of doc 0
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    with patch.object(w43, "t", lambda _s, _d, _n, **_k: docs):
        got = {
            r["lcp_tokens"]: r["n_pairs"]
            for r in w43.dedup_suffix_lcp_histogram(spark, "unused").collect()
        }
    sufs = []
    for did, text in texts:
        toks = text.split()
        for i in range(len(toks)):
            sufs.append((toks[i : i + 30], did, i))
    sufs.sort(key=lambda x: (" ".join(x[0]), x[1], x[2]))
    exp: dict[int, int] = {}
    for (a, _, _), (b, _, _) in zip(sufs, sufs[1:]):
        n = 0
        while n < min(len(a), len(b)) and a[n] == b[n]:
            n += 1
        if n >= 5:
            exp[n] = exp.get(n, 0) + 1
    assert got == exp, (got, exp)
    assert max(exp) == 8  # the full-document duplicate


def test_url_canonicalize_idempotent_and_order_free(spark):
    """Algebraic contract of wave43 canonicalize_url on ~300 generated
    adversarial URLs (seeded, one Spark job): (a) IDEMPOTENT — a
    canonical URL re-canonicalizes to itself, so re-keying an
    already-keyed crawl is a no-op; (b) param-order-FREE — any
    permutation of the same query params yields the same key; (c) the
    host split agrees between the pair."""
    import random

    from cicevse2024_tfm_datapipeline_spark.plans.wave43 import canonicalize_url

    rng = random.Random(431)
    schemes = ["http", "HTTP", "https", "HTTPS", "hTtPs"]
    hosts = ["foo.example.com", "WWW.Foo.Example.COM", "wwwx.ex.org", "a.b"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a//b", "/a/b/", "/x/index.html", "//p", "/a/b/c/index.html"]
    params = ["a=1", "z=9", "b=2", "utm_source=x", "fbclid=q", "gclid=r", "ref=t"]
    frags = ["", "#f", "#sec-2"]
    rows = []
    for _ in range(300):
        chosen = rng.sample(params, rng.randint(0, len(params)))
        perm = chosen[:]
        rng.shuffle(perm)
        q1 = ("?" + "&".join(chosen)) if chosen else ""
        q2 = ("?" + "&".join(perm)) if perm else ""
        base = rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        path = rng.choice(paths)
        frag = rng.choice(frags)
        rows.append((base + path + q1 + frag, base + path + q2 + frag))
    df = spark.createDataFrame(rows, "u1 string, u2 string")
    c1, h1 = canonicalize_url(F.col("u1"))
    c2, h2 = canonicalize_url(F.col("u2"))
    once = df.select(
        "u1", c1.alias("c1"), h1.alias("h1"), c2.alias("c2"), h2.alias("h2")
    )
    cc, hh = canonicalize_url(F.col("c1"))
    bad = once.select(
        "u1", "c1", "h1", "c2", "h2", cc.alias("cc"), hh.alias("hh")
    ).filter(
        (F.col("cc") != F.col("c1"))       # not idempotent
        | (F.col("c2") != F.col("c1"))     # param order leaked into the key
        | (F.col("hh") != F.col("h1"))     # host drifted on re-canonicalize
        | (F.col("h2") != F.col("h1"))
    )
    offenders = bad.limit(5).collect()
    assert not offenders, offenders


def test_prefix56_monotone_in_string_order(spark):
    """wave43 _prefix56's load-bearing property: s1 <= s2 implies
    k1 <= k2 (non-strict monotone) — this is what lets the suffix sort
    ride bounds_bucketed on a NUMERIC key. Seeded random strings over
    printable ASCII PLUS multi-byte UTF-8 (Latin-1 sup, CJK, emoji —
    the code-point-packing inversion class the byte derivation fixed),
    lengths 0..12 (crossing the 7-byte truncation and the zero-pad
    edge), verified by sorting collected (s, k) pairs by s and
    asserting k never decreases. Python's code-point sort matches the
    engines' UTF-8 byte order because UTF-8 is order-preserving."""
    import random

    from cicevse2024_tfm_datapipeline_spark.plans.wave43 import _prefix56

    rng = random.Random(64)
    alpha = [chr(c) for c in range(32, 127)] + list("ÿĀāéß漢字日本語🎉🚀")
    strs = {""}
    while len(strs) < 400:
        strs.add("".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))))
    # adversarial shared-prefix families around the truncation boundary,
    # plus the documented inversion pair ('Ā' vs '\x01\xff')
    for base in ("abcdefg", "abcdefgh", "abcdefghi", "       ", "Ā", "\x01\xff"):
        for tail in ("", " ", "!", "~", "a", "zz", "Ā"):
            strs.add(base + tail)
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    pairs = df.select("s", _prefix56(F.col("s")).alias("k")).collect()
    pairs.sort(key=lambda r: r["s"])
    for a, b in zip(pairs, pairs[1:]):
        assert a["k"] <= b["k"], (a["s"], a["k"], b["s"], b["k"])


def test_suffix_lcp_non_ascii_corpus(spark):
    """End-to-end pin of the byte-derived suffix key: a corpus mixing
    CJK, accented Latin, and emoji tokens (the code-point-packing
    inversion class) must still reproduce the brute-force lexicographic
    adjacency histogram — Python's sort matches the engines' UTF-8 byte
    order because UTF-8 is order-preserving."""
    from unittest.mock import patch

    import cicevse2024_tfm_datapipeline_spark.plans.wave43 as w43

    texts = [
        (0, "漢字 école Ā réforme données 🎉 fin"),
        (1, "école Ā réforme données 🎉 extra suffixe ici"),  # 4-token run? see ref
        (2, "漢字 école Ā réforme données 🎉 fin"),  # exact dup of 0
        (3, "\x01ÿ Ā byte order pin aa bb cc dd ee"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    with patch.object(w43, "t", lambda _s, _d, _n, **_k: docs):
        got = {
            r["lcp_tokens"]: r["n_pairs"]
            for r in w43.dedup_suffix_lcp_histogram(spark, "unused").collect()
        }
    sufs = []
    for did, text in texts:
        toks = text.split()
        for i in range(len(toks)):
            sufs.append((toks[i : i + 30], did, i))
    sufs.sort(key=lambda x: (" ".join(x[0]), x[1], x[2]))
    exp: dict[int, int] = {}
    for (a, _, _), (b, _, _) in zip(sufs, sufs[1:]):
        n = 0
        while n < min(len(a), len(b)) and a[n] == b[n]:
            n += 1
        if n >= 5:
            exp[n] = exp.get(n, 0) + 1
    assert got == exp, (got, exp)
    assert max(exp) == 7  # the full 7-token duplicate document


def test_levenshtein_threshold_arg_matches_full_distance(spark):
    """wave42 j_levenshtein_blocked relies on Spark's band-limited
    levenshtein(l, r, threshold) returning -1 above the threshold and
    the TRUE distance at or below it — pin that contract (the oracle
    computes the full distance and filters; the sets must be equal)."""
    rows = [
        ("small ring", "small ring", 0),
        ("small ring", "small rung", 1),
        ("small ring", "small bolt", 4),
        ("small ring", "red widget", -1),  # true distance 8 > 4
    ]
    df = spark.createDataFrame(rows, "a string, b string, expected int")
    got = df.select(
        "expected", F.levenshtein("a", "b", 4).alias("d")
    ).collect()
    for r in got:
        assert r["d"] == r["expected"], (r["d"], r["expected"])
