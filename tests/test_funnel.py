"""Funnel: hand-built scenarios, python differential on real events,
monotone counts."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.funnel import funnel_counts, funnel_times
from linkml_store_spark.sources.tables import load_table


def test_funnel_hand_scenarios(spark):
    rows = [
        # u1 completes A -> B -> C in order
        (1, "A", "2024-01-01 10:00:00"), (1, "B", "2024-01-01 10:05:00"),
        (1, "C", "2024-01-01 10:10:00"),
        # u2: B BEFORE A must not count; then no B after A
        (2, "B", "2024-01-01 09:00:00"), (2, "A", "2024-01-01 09:30:00"),
        # u3: A then C (skips B) -> stuck after step 1
        (3, "A", "2024-01-01 08:00:00"), (3, "C", "2024-01-01 08:30:00"),
        # u4: never does A
        (4, "B", "2024-01-01 07:00:00"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["step"]: r["n_users"] for r in
           funnel_counts(ev, ["A", "B", "C"]).collect()}
    assert out == {"A": 3, "B": 1, "C": 1}

    t = {r["user_id"]: r for r in funnel_times(ev, ["A", "B", "C"]).collect()}
    assert t[2]["t_2"] is None          # pre-A B doesn't count
    assert t[3]["t_2"] is None and t[3]["t_3"] is None


def test_funnel_within_window(spark):
    rows = [
        (1, "A", "2024-01-01 10:00:00"), (1, "B", "2024-01-01 10:30:00"),
        (2, "A", "2024-01-01 10:00:00"), (2, "B", "2024-01-02 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["step"]: r["n_users"] for r in
           funnel_counts(ev, ["A", "B"], within_seconds=3600).collect()}
    assert out == {"A": 2, "B": 1}  # u2's B is a day later


def test_funnel_python_differential(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    steps = ["view", "click", "purchase"]
    got = {r["step"]: r["n_users"] for r in funnel_counts(ev, steps).collect()}

    rows = ev.select("user_id", "event_type", "ts").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    want = dict.fromkeys(steps, 0)
    for evs in by_user.values():
        evs.sort()
        prev_t = None
        for i, s in enumerate(steps):
            cand = [
                t for t, e in evs
                if e == s and (prev_t is None or t > prev_t)
            ]
            if not cand:
                break
            prev_t = min(cand)
            want[s] += 1
    assert got == want
    # monotone
    ns = [got[s] for s in steps]
    assert ns == sorted(ns, reverse=True)


def test_cohort_retention_differential(spark, sf_dir):
    from linkml_store_spark.operators.funnel import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r["cohort"], r["offset"]): (r["n_users"], r["retention"])
        for r in cohort_retention(ev, period="week").collect()
    }
    # python reference
    import datetime

    rows = ev.select("user_id", "ts").collect()
    def week(d):
        d = d.date() if hasattr(d, "date") else d
        return d - datetime.timedelta(days=d.weekday())
    first = {}
    for r in rows:
        u, w = r["user_id"], week(r["ts"])
        if u not in first or w < first[u]:
            first[u] = w
    cells = {}
    for r in rows:
        u, w = r["user_id"], week(r["ts"])
        off = (w - first[u]).days // 7
        cells.setdefault((str(first[u]), off), set()).add(u)
    want = {}
    for (c, off), users in cells.items():
        base = len(cells[(c, 0)])
        want[(c, off)] = (len(users), round(len(users) / base, 6))
    assert got == want
    # offset 0 retention is 1.0 everywhere
    assert all(v[1] == 1.0 for k, v in got.items() if k[1] == 0)
