"""Classical randomness tests per signal, pure whole-stage codegen.

Three nonparametric diagnostics the timeseries literature runs before
trusting an entropy estimate (a sequence failing these is structured,
not noisy — route it to the dynamics operators, not the i.i.d. ones):

* ``runs_test`` — Wald–Wolfowitz runs test above/below the median
  (Wald & Wolfowitz 1940, Ann. Math. Stat. 11): too few runs means
  trending/clustered, too many means oscillating.
* ``turning_points`` — turning-point count T vs the i.i.d. expectation
  E[T] = 2(n−2)/3, Var[T] = (16n−29)/90 (Kendall & Stuart, the classic
  randomness-against-trend test).
* ``variance_ratio`` — the Lo–MacKinlay variance-ratio test
  (Lo & MacKinlay 1988, Rev. Fin. Studies 1): VR(q) compares the
  variance of q-step increments against q× the one-step variance;
  VR < 1 flags mean reversion, VR > 1 momentum, with the published
  homoskedastic asymptotic z.
* ``arch_lm`` — Engle's one-lag ARCH LM test for volatility
  clustering (Engle 1982): N·R² of the squared-increment lag
  regression, the standard pre-test before trusting homoskedastic
  inference.
* ``record_stats`` — upper/lower record counts vs the i.i.d.
  expectation H_n (Glick 1978): the O(n) trend screen dual to the
  turning-point test.

Exactness protocol (the repo's exact-integer rule): every sum the
statistics need — run/turning counts, Σd, Σd², Σy, Σy² over integer
tokens — is an EXACT int64 computed in-row, and each statistic is then
ONE fixed float expression over those integers, written in the same
shape on the Spark and DuckDB sides, so the value-hash compare is
bit-deterministic.  The runs-test median of an integer array is k or
k + 0.5 — exact in a double — so the above/below split is unambiguous.

Scale shape: zero Python, zero joins, zero windows — each test is
in-row expression work over the array layout (slices + zip_with +
integer-accumulator aggregate), so the plan carries only tokenize's
Exchange.  Work is O(n) per signal.  (Spark evaluates higher-order
lambdas interpreted, not codegen — acceptable here because each test
is a single O(n) integer fold, unlike acf's O(n·m); see
operators/acf.py for where that tradeoff flips.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["runs_test", "turning_points", "variance_ratio", "arch_lm", "record_stats"]


def _isum(arr: Column) -> Column:
    """Exact int64 sum of an integer array (long accumulator)."""
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)


def _staged(df: DataFrame, array_col: str, keep_cols: tuple[str, ...]):
    """(*keep_cols, _arr) with empty/NULL arrays dropped."""
    return df.select(
        *keep_cols, F.col(array_col).alias("_arr")
    ).filter(F.size("_arr") >= 1)


def runs_test(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, n1, n2, runs, z) — one row per signal.

    Median-split runs test: values equal to the median are discarded
    (the standard continuity correction for discrete data), n1/n2
    count values above/below, ``runs`` the maximal constant-sign
    blocks.  ``z`` uses the exact Wald–Wolfowitz moments

        E[R] = 1 + 2·n1·n2/m,   Var[R] = a·(a−m)/(m²·(m−1)),
        a = 2·n1·n2,  m = n1+n2

    and is NULL when the statistic is degenerate (n1 = 0, n2 = 0, or
    a ≤ m, where Var[R] = 0).
    """
    arr = F.col("_arr")
    n = F.size(arr)
    srt = F.array_sort(arr)
    # interpolated median of an integer array: exact k or k + 0.5
    med = (
        F.element_at(srt, ((n + 1) / 2).cast("int")).cast("double")
        + F.element_at(srt, (n / 2).cast("int") + 1).cast("double")
    ) / F.lit(2.0)
    signs = F.filter(
        F.transform(
            arr,
            lambda x: F.when(x.cast("double") > med, 1)
            .when(x.cast("double") < med, -1)
            .otherwise(0),
        ),
        lambda s: s != 0,
    )

    base = (
        _staged(df, array_col, keep_cols)
        .withColumn("_signs", signs)
        .select(
            *keep_cols,
            n.alias("n"),
            F.col("_signs"),
            F.size("_signs").alias("_m"),
        )
    )
    m = F.col("_m")
    n1 = ((_isum(F.col("_signs")) + m) / 2).cast("long")
    runs = F.when(
        m >= 2,
        1
        + F.aggregate(
            F.zip_with(
                F.slice(F.col("_signs"), 1, m - 1),
                F.slice(F.col("_signs"), 2, m - 1),
                lambda a, b: F.when(a != b, 1).otherwise(0),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    ).otherwise(m.cast("long"))
    counted = base.select(
        *keep_cols,
        "n",
        n1.alias("n1"),
        (m.cast("long") - n1).alias("n2"),
        runs.alias("runs"),
        m.cast("double").alias("_md"),
    ).withColumn(
        "_a", F.lit(2.0) * F.col("n1").cast("double") * F.col("n2").cast("double")
    )
    e = F.lit(1.0) + F.col("_a") / F.col("_md")
    v = (F.col("_a") * (F.col("_a") - F.col("_md"))) / (
        F.col("_md") * F.col("_md") * (F.col("_md") - F.lit(1.0))
    )
    z = F.when(
        (F.col("n1") >= 1) & (F.col("n2") >= 1) & (F.col("_a") > F.col("_md")),
        (F.col("runs").cast("double") - e) / F.sqrt(v),
    )
    return counted.select(*keep_cols, "n", "n1", "n2", "runs", z.alias("z"))


def turning_points(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, tp, z) — turning-point count per signal.

    Interior position i is a turning point when
    (x_i − x_{i−1})·(x_{i+1} − x_i) < 0 (strict — plateau/tie steps
    never count, the discrete-data convention).  ``z`` against
    E[T] = 2(n−2)/3, Var[T] = (16n−29)/90; NULL when n < 3.
    """
    arr = F.col("_arr")
    n = F.size(arr)
    d = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: (b.cast("long") - a.cast("long")),
    )
    base = (
        _staged(df, array_col, keep_cols)
        .withColumn("_d", F.when(n >= 2, d))
        .select(*keep_cols, n.alias("n"), F.col("_d"))
    )
    nd = F.size("_d")
    tp = F.when(
        F.col("n") >= 3,
        F.aggregate(
            F.zip_with(
                F.slice(F.col("_d"), 1, nd - 1),
                F.slice(F.col("_d"), 2, nd - 1),
                lambda a, b: F.when(a * b < 0, 1).otherwise(0),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    ).otherwise(F.lit(0).cast("long"))
    counted = base.select(*keep_cols, "n", tp.alias("tp"))
    ndbl = F.col("n").cast("double")
    et = F.lit(2.0) * (ndbl - F.lit(2.0)) / F.lit(3.0)
    vt = (F.lit(16.0) * ndbl - F.lit(29.0)) / F.lit(90.0)
    z = F.when(
        F.col("n") >= 3, (F.col("tp").cast("double") - et) / F.sqrt(vt)
    )
    return counted.select(*keep_cols, "n", "tp", z.alias("z"))


def variance_ratio(
    df: DataFrame,
    q: int = 4,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, vr, z) — Lo–MacKinlay VR(q) per signal.

    With T = n−1 one-step increments d and overlapping q-step
    increments y_i = x_i − x_{i−q}:

        μ = (x_T − x_0)/T
        σ²_a = Σ(d−μ)² / (T−1)
        σ²_b = Σ(y−qμ)² / m,   m = q·(T−q+1)·(1 − q/T)
        VR  = σ²_b / σ²_a
        z   = √T·(VR−1) / √(2(2q−1)(q−1)/(3q))

    Both SSRs come from exact int64 sums (Σd, Σd², Σy, Σy²) via the
    algebraic expansions Σ(d−μ)² = Σd² − μ·Σd and
    Σ(y−qμ)² = Σy² − 2qμ·Σy + (T−q+1)·(qμ)², so the float work is one
    fixed expression.  Rows need n ≥ q+2 (T > q) and a non-constant
    series — otherwise vr/z are NULL.
    """
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    arr = F.col("_arr")
    n = F.size(arr)
    d2 = F.when(
        n >= 2,
        F.aggregate(
            F.zip_with(
                F.slice(arr, 1, n - 1),
                F.slice(arr, 2, n - 1),
                lambda a, b: (
                    (b.cast("long") - a.cast("long"))
                    * (b.cast("long") - a.cast("long"))
                ),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    ).otherwise(F.lit(0).cast("long"))
    ny = n - q
    y = F.when(
        n >= q + 1,
        F.zip_with(
            F.slice(arr, 1, ny),
            F.slice(arr, q + 1, ny),
            lambda a, b: (b.cast("long") - a.cast("long")),
        ),
    ).otherwise(F.array().cast("array<long>"))

    base = _staged(df, array_col, keep_cols).select(
        *keep_cols,
        n.alias("n"),
        (
            F.element_at(arr, n).cast("long")
            - F.element_at(arr, 1).cast("long")
        ).alias("_sd"),
        d2.alias("_sd2"),
        _isum(y).alias("_sy"),
        F.aggregate(
            F.transform(y, lambda v: v * v),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("_sy2"),
    )
    qd = F.lit(float(q))
    td = (F.col("n") - 1).cast("double")
    mu = F.col("_sd").cast("double") / td
    ssd = F.col("_sd2").cast("double") - mu * F.col("_sd").cast("double")
    qmu = qd * mu
    nq = td - qd + F.lit(1.0)
    ssy = (
        F.col("_sy2").cast("double")
        - F.lit(2.0) * qmu * F.col("_sy").cast("double")
        + nq * qmu * qmu
    )
    mden = qd * nq * (F.lit(1.0) - qd / td)
    vr = F.when(
        ((F.col("n") - 1) > F.lit(q)) & (ssd > F.lit(0.0)),
        (ssy / mden) / (ssd / (td - F.lit(1.0))),
    )
    z = F.sqrt(td) * (vr - F.lit(1.0)) / F.sqrt(
        F.lit(2.0)
        * (F.lit(2.0) * qd - F.lit(1.0))
        * (qd - F.lit(1.0))
        / (F.lit(3.0) * qd)
    )
    return base.select(*keep_cols, "n", vr.alias("vr"), z.alias("z"))


def arch_lm(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, n_pairs, r2, lm) — Engle's one-lag ARCH LM test
    per signal (Engle 1982, Econometrica 50).

    With increments d_t = x_{t+1} − x_t and squared increments
    s_t = d_t², the test regresses s_t on s_{t−1}: under no ARCH
    effects the lag carries no information and LM = N·R² ~ χ²(1)
    (N = number of (s_{t−1}, s_t) pairs).  R² is the squared Pearson
    correlation of the lag pairs:

        R² = (N·Σuv − Σu·Σv)² / ((N·Σuu − (Σu)²)(N·Σvv − (Σv)²))

    Squared-increment moments overflow int64 (s² can reach ~9e19 for
    the token range), so Σuu/Σvv/Σuv accumulate in DECIMAL(38,0) —
    exact — mirrored by HUGEINT sums in the oracle; the cast to double
    and the one fixed float expression are then bit-deterministic.
    R²/lm are NULL for constant-variance degenerate pairs (either
    variance term = 0); rows need n ≥ 5 (≥ 3 pairs).
    """
    dec = "decimal(38,0)"
    arr = F.col("_arr")
    n = F.size(arr)
    d = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: b.cast("long") - a.cast("long"),
    )
    s = F.transform(d, lambda x: x * x)  # ≤ ~9.6e9 each: exact long
    m = n - 1
    u = F.slice(s, 1, m - 1)
    v = F.slice(s, 2, m - 1)

    def dsum(pairs: Column) -> Column:
        return F.aggregate(
            pairs,
            F.lit(0).cast(dec),
            lambda a, x: (a + x).cast(dec),
        )

    prod = lambda a, b: (a.cast(dec) * b.cast(dec)).cast(dec)  # noqa: E731
    base = (
        _staged(df, array_col, keep_cols)
        .filter(n >= 5)
        .select(
            *keep_cols,
            n.alias("n"),
            (m - 1).cast("long").alias("n_pairs"),
            _isum(u).alias("_su"),
            _isum(v).alias("_sv"),
            dsum(F.zip_with(u, u, prod)).alias("_suu"),
            dsum(F.zip_with(v, v, prod)).alias("_svv"),
            dsum(F.zip_with(u, v, prod)).alias("_suv"),
        )
    )
    npd = F.col("n_pairs").cast("double")
    sud, svd = F.col("_su").cast("double"), F.col("_sv").cast("double")
    cov = npd * F.col("_suv").cast("double") - sud * svd
    varu = npd * F.col("_suu").cast("double") - sud * sud
    varv = npd * F.col("_svv").cast("double") - svd * svd
    r2 = F.when((varu > 0.0) & (varv > 0.0), cov * cov / (varu * varv))
    return base.select(
        *keep_cols, "n", "n_pairs",
        r2.alias("r2"), (npd * r2).alias("lm"),
    )


def record_stats(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, n_up, n_down, asym, rec_rate) — record
    statistics per signal (Glick 1978, Am. Math. Monthly 85; record
    theory survey: Krug 2007, J. Stat. Mech.).

    n_up counts upper records (x_i strictly above the running max,
    the first sample counting as a record), n_down lower records.
    For an i.i.d. continuous series both have expectation
    H_n = Σ_{k≤n} 1/k ≈ ln n + γ — a trending series drives one side
    toward n while stationary noise keeps both logarithmic, making
    this the O(n) trend screen dual to ``turning_points``.  ``asym``
    = n_up − n_down (exact int), ``rec_rate`` = (n_up + n_down)/(2n)
    (one division — bit-deterministic).  Ties are not records (strict
    inequality).  Rows need n ≥ 2.
    """
    arr = F.col("_arr")
    n = F.size(arr)
    el = lambda i: F.element_at(arr, (i + 1).cast("int")).cast("long")  # noqa: E731
    zero = F.struct(
        F.lit(1).cast("long").alias("up"),
        F.lit(1).cast("long").alias("dn"),
        el(F.lit(0)).alias("mx"),
        el(F.lit(0)).alias("mn"),
    )

    def step(acc: Column, i: Column) -> Column:
        x = el(i)
        return F.struct(
            (
                acc.getField("up")
                + F.when(x > acc.getField("mx"), 1).otherwise(0)
            ).alias("up"),
            (
                acc.getField("dn")
                + F.when(x < acc.getField("mn"), 1).otherwise(0)
            ).alias("dn"),
            F.greatest(acc.getField("mx"), x).alias("mx"),
            F.least(acc.getField("mn"), x).alias("mn"),
        )

    base = (
        _staged(df, array_col, keep_cols)
        .filter(n >= 2)
        .withColumn(
            "_acc", F.aggregate(F.sequence(F.lit(1), n - 1, F.lit(1)), zero, step)
        )
        .select(
            *keep_cols,
            n.alias("n"),
            F.col("_acc").getField("up").alias("n_up"),
            F.col("_acc").getField("dn").alias("n_down"),
        )
    )
    return base.select(
        *keep_cols, "n", "n_up", "n_down",
        (F.col("n_up") - F.col("n_down")).cast("long").alias("asym"),
        (
            (F.col("n_up") + F.col("n_down")).cast("double")
            / (F.lit(2.0) * F.col("n").cast("double"))
        ).alias("rec_rate"),
    )
