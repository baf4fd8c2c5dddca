"""Independent pure-Python model checks for the operators/cep.py pattern
compiler (the third leg beside the Spark lane and the compile_sql DuckDB
replay): a from-scratch matcher over in-memory event lists, exercised on
the real sf0.001 corpus AND on seeded synthetic streams dense enough to
hit every quantifier arm."""

from __future__ import annotations

import random
from collections import defaultdict

import duckdb
import pytest

from postgresql_datawarehouse_excercise_spark.operators.cep import (
    cep_match,
    compile_sql,
)

SF = "/root/testdata/sf0.001"


def _model_match(rows, pattern, max_span_us):
    """All occurrences of `pattern` in one user's sorted event list.

    rows: [(t_us, event_id, etype)] sorted; returns set of
    (t_first_us, t_last_us, duration_us, n_events, n_stage0, ...).
    Semantics mirror operators/cep.py's declared contract: strictly
    consecutive, quantified stages consume a MAXIMAL run drawn from the
    stage's alternative type set ('a' or 'a|b'), '?' consumes exactly one
    event or none, '*' a maximal run or none; bounded '{n,m}'/'{n,}'
    (round 15) requires the maximal run's length in [n, m] and consumes
    it whole -- except a FINAL stage with finite m, which greedily caps
    at min(run, m) rows (match iff run >= n).
    """
    import re as _re

    n = len(rows)
    out = set()

    def alts(etype):
        return set(etype.split("|"))

    def run_len(pos, etype):
        r = 0
        while pos + r < n and rows[pos + r][2] in alts(etype):
            r += 1
        return r

    def go(pos, si, counts):
        if si == len(pattern):
            yield pos, counts
            return
        etype, quant = pattern[si]
        rng = _re.match(r"^\{(\d+),(\d*)\}$", quant)
        if rng:
            lo = int(rng.group(1))
            hi = int(rng.group(2)) if rng.group(2) else None
            r = run_len(pos, etype)
            if si == len(pattern) - 1 and hi is not None:
                if r >= lo:
                    take = min(r, hi)
                    yield from go(pos + take, si + 1, counts + [take])
            elif r >= lo and (hi is None or r <= hi):
                yield from go(pos + r, si + 1, counts + [r])
            return
        if quant in ("?", "*"):
            yield from go(pos, si + 1, counts + [0])
        if pos >= n:
            return
        if quant == "1" or quant == "?":
            if rows[pos][2] in alts(etype):
                yield from go(pos + 1, si + 1, counts + [1])
        else:  # "+" / "*"
            r = run_len(pos, etype)
            if r >= 1:
                yield from go(pos + r, si + 1, counts + [r])

    first_alts = alts(pattern[0][0])
    first_is_run = pattern[0][1] == "+" or pattern[0][1].startswith("{")
    for start in range(n):
        if rows[start][2] not in first_alts:
            continue
        # for a '+'/bounded first stage only maximal-run STARTS anchor
        # (the engine joins whole islands)
        if first_is_run and start > 0 and rows[start - 1][2] in first_alts:
            continue
        for end, counts in go(start, 0, []):
            t0, t1 = rows[start][0], rows[end - 1][0]
            if t1 - t0 <= max_span_us:
                out.add((t0, t1, t1 - t0, sum(counts), *counts))
    return out


def _real_corpus_by_user():
    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, epoch_us(ts), event_id, event_type FROM"
        f" read_parquet('{SF}/events.parquet')"
    ).fetchall()
    by_user: dict[int, list] = defaultdict(list)
    for u, t_us, eid, et in evs:
        by_user[u].append((t_us, eid, et))
    for rows in by_user.values():
        rows.sort()
    return by_user


PATTERNS = [
    [("view", "1"), ("click", "+"), ("purchase", "1")],
    [("signup", "1"), ("view", "*"), ("purchase", "1")],
    [("signup", "1"), ("error", "?"), ("purchase", "1")],
    [("click", "+"), ("view", "*"), ("purchase", "1")],
    [("signup", "1"), ("view|click", "+"), ("purchase", "1")],
    [("signup", "1"), ("view|error", "*"), ("click|purchase", "1")],
]
MAX_US = 24 * 3600 * 1000000


@pytest.mark.parametrize("pattern", PATTERNS, ids=lambda p: "".join(
    f"{t}{'' if q == '1' else q}" for t, q in p))
def test_cep_compiler_matches_python_model(spark, pattern):
    by_user = _real_corpus_by_user()
    expect = set()
    for u, rows in by_user.items():
        for m in _model_match(rows, pattern, MAX_US):
            expect.add((u, *m))
    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    got = {tuple(r) for r in cep_match(events, pattern, MAX_US).collect()}
    assert got == expect
    assert len(got) > 0  # every parametrized pattern must actually fire


def test_cep_sql_twin_matches_model_synthetic(spark):
    """Seeded synthetic streams (3 users x 400 events over a tiny alphabet
    => dense pattern hits) checked three ways: python model == Spark lane
    == compile_sql on DuckDB."""
    rng = random.Random(12012)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(400):
            t += rng.randint(1, 3600) * 1000000
            rows.append((u, eid, rng.choice(["a", "b", "c", "p"]), t))
            eid += 1
    span = 4 * 3600 * 1000000

    by_user = defaultdict(list)
    for u, e, et, t in rows:
        by_user[u].append((t, e, et))
    for rs in by_user.values():
        rs.sort()

    df = spark.createDataFrame(
        [(u, e, et, t) for u, e, et, t in rows],
        "user_id long, event_id long, event_type string, t long",
    ).selectExpr("user_id", "event_id", "event_type",
                 "timestamp_micros(t) AS ts")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " make_timestamp(t) AS ts FROM (SELECT * FROM (VALUES "
        + ",".join(f"({u},{e},'{et}',{t})" for u, e, et, t in rows)
        + ") v(user_id, event_id, event_type, t))"
    )

    for pattern in (
        [("a", "1"), ("b", "*"), ("c", "?"), ("p", "+")],
        # alternation arms: quantified two-type run + alternation anchors
        [("a", "1"), ("b|c", "+"), ("p", "1")],
        [("a|p", "+"), ("b", "?"), ("c", "1")],
    ):
        expect = set()
        for u, rs in by_user.items():
            for m in _model_match(rs, pattern, span):
                expect.add((u, *m))
        assert len(expect) > 5
        got = {tuple(r) for r in cep_match(df, pattern, span).collect()}
        assert got == expect
        sql_rows = con.execute(compile_sql(pattern, span)).fetchall()
        assert {tuple(r) for r in sql_rows} == expect


def test_cep_bounded_quantifiers_three_way(spark):
    """Bounded repetition '{n,m}'/'{n,}' (round 15), three ways on a
    seeded synthetic stream whose alphabet is weighted toward 'b' so
    b-runs of every length 1..6 appear: model == Spark == compile_sql
    on DuckDB.  Covers runs shorter than n (rejected), inside [n, m]
    (consumed whole), and longer than m -- rejected at non-final
    positions (full-run consumption forced by adjacent disjointness)
    but greedily CAPPED at a final stage (min(run, m) rows)."""
    rng = random.Random(4242)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(400):
            t += rng.randint(1, 3600) * 1000000
            rows.append((u, eid, rng.choice(["a", "b", "b", "b", "p"]), t))
            eid += 1
    span = 12 * 3600 * 1000000

    by_user = defaultdict(list)
    for u, e, et, t in rows:
        by_user[u].append((t, e, et))
    for rs in by_user.values():
        rs.sort()

    df = spark.createDataFrame(
        [(u, e, et, t) for u, e, et, t in rows],
        "user_id long, event_id long, event_type string, t long",
    ).selectExpr("user_id", "event_id", "event_type",
                 "timestamp_micros(t) AS ts")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " make_timestamp(t) AS ts FROM (SELECT * FROM (VALUES "
        + ",".join(f"({u},{e},'{et}',{t})" for u, e, et, t in rows)
        + ") v(user_id, event_id, event_type, t))"
    )

    for pattern in (
        [("a", "1"), ("b", "{2,3}"), ("p", "1")],
        [("a", "1"), ("b", "{2,}"), ("p", "1")],
        [("a", "1"), ("b", "{1,2}")],            # final greedy cap
        [("b", "{2,4}"), ("p", "1")],            # bounded first stage
        [("a", "1"), ("b", "*"), ("p", "{1,2}")],  # optional arm + final cap
        [("a", "1"), ("b", "{1,1}")],            # {1,1} = run of exactly 1
    ):
        expect = set()
        for u, rs in by_user.items():
            for m in _model_match(rs, pattern, span):
                expect.add((u, *m))
        assert len(expect) > 5, pattern
        got = {tuple(r) for r in cep_match(df, pattern, span).collect()}
        assert got == expect, pattern
        sql_rows = con.execute(compile_sql(pattern, span)).fetchall()
        assert {tuple(r) for r in sql_rows} == expect, pattern


def test_cep_bounded_final_cap_pinned(spark):
    """Hand-built stream pinning the final-cap semantics exactly:
    a b b b b  with pattern `a b{1,2}` consumes the a and exactly TWO
    bs (greedy cap), t_last is the SECOND b's timestamp, and the
    all-rows output classifies precisely those three rows."""
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_rows,
    )

    H = 3600 * 1000000
    evs = [(1, i, et, (i + 1) * H) for i, et in enumerate("abbbb")]
    df = spark.createDataFrame(
        evs, "user_id long, event_id long, event_type string, t long"
    ).selectExpr("user_id", "event_id", "event_type",
                 "timestamp_micros(t) AS ts")
    span = 24 * H
    got = cep_match(df, [("a", "1"), ("b", "{1,2}")], span).collect()
    assert len(got) == 1
    m = got[0]
    assert (m.n_stage0, m.n_stage1, m.n_events) == (1, 2, 3)
    assert m.t_first_us == 1 * H and m.t_last_us == 3 * H  # 2nd b, not 4th
    # all-rows flow-through: end_seq = start_seq + consumed - 1 must hold
    rows_out = cep_match_rows(
        df, [("a", "1"), ("b", "{1,2}")], span
    ).collect()
    assert sorted((r.event_id, r.classifier) for r in rows_out) == [
        (0, 0), (1, 1), (2, 1)
    ]
    # a run SHORTER than the lower bound never matches
    assert (
        cep_match(df, [("a", "1"), ("b", "{5,}")], span).count() == 0
    )


def test_cep_bounded_validation(spark):
    """Bounded-quantifier validation: zero lower bound, inverted bounds
    and measures on a final capped stage are rejected; measures on a
    non-final bounded stage stay exact (full-run consumption)."""
    from postgresql_datawarehouse_excercise_spark.catalog import (
        normalize_event_ts,
    )

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    for pat in (
        [("view", "1"), ("click", "{0,3}"), ("purchase", "1")],
        [("view", "1"), ("click", "{3,2}"), ("purchase", "1")],
        [("view", "1"), ("click", "{2,x}"), ("purchase", "1")],
    ):
        with pytest.raises(ValueError):
            cep_match(events, pat, MAX_US)
    with pytest.raises(ValueError, match="final"):
        cep_match(
            events,
            [("view", "1"), ("click", "{1,2}")],
            MAX_US,
            measures=[(1, "sum", "value", "s")],
        )
    with pytest.raises(ValueError, match="final"):
        compile_sql(
            [("view", "1"), ("click", "{1,2}")],
            MAX_US,
            measures=[(1, "sum", "value", "s")],
        )
    # non-final bounded stage: measures legal, Spark == DuckDB
    pat = [("view", "1"), ("click", "{1,3}"), ("purchase", "1")]
    meas = [(1, "sum", "value", "click_sum_c")]
    got = {
        tuple(r)
        for r in cep_match(events, pat, MAX_US, measures=meas).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    exp = {
        tuple(r)
        for r in con.execute(
            compile_sql(pat, MAX_US, measures=meas)
        ).fetchall()
    }
    assert got == exp and len(got) > 0


def test_cep_validate_rejects_bad_patterns(spark):
    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    for bad in [
        [("view", "1")],                                  # too short
        [("view", "2"), ("click", "1")],                  # bad quantifier
        [("view", "?"), ("click", "1")],                  # empty-able anchor
        [("view", "1"), ("click", "*")],                  # empty-able anchor
        [("view", "1"), ("view", "+")],                   # adjacent same type
        [("view", "1"), ("click", "?"), ("view", "1")],   # adjacent via skip
        [("view|click", "1"), ("click", "+")],            # overlapping sets
        [("view", "1"), ("click|click", "+")],            # dup alternative
        [("view'; --", "1"), ("click", "+")],             # non-identifier type
        [("view click", "1"), ("click", "+")],            # space in type
    ]:
        with pytest.raises(ValueError):
            cep_match(events, bad, MAX_US)
    # sanity: the same-type pair separated by a MANDATORY stage is legal,
    # as is an alternation whose set is disjoint from its neighbors
    cep_match(
        events, [("view", "1"), ("click", "+"), ("view", "1")], MAX_US
    )
    cep_match(
        events, [("signup", "1"), ("view|click", "+"), ("purchase", "1")],
        MAX_US,
    )


def test_stream_cep_retracts_on_late_arrival(spark, tmp_path):
    """Strictly-consecutive CEP is NON-MONOTONE under out-of-order
    arrival: epoch 0 reports a match; a late event whose timestamp lands
    between the view and the click breaks contiguity and the revised
    epoch must RETRACT it (the reason x_stream_cep emits in update mode
    and the last snapshot is the answer)."""
    from postgresql_datawarehouse_excercise_spark.streaming.cep_stream import (
        cep_replay_sink,
    )

    H = 3600 * 1000000
    pattern = [("view", "1"), ("click", "+"), ("purchase", "1")]

    def df(rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, t long"
        ).selectExpr("user_id", "event_id", "event_type",
                     "timestamp_micros(t) AS ts")

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    sink = cep_replay_sink(spark, state, out, pattern, 24 * H)
    # epoch 0: view - click - purchase, consecutive => one match
    sink(df([(1, 1, "view", 1 * H), (1, 2, "click", 2 * H),
             (1, 3, "purchase", 3 * H)]), 0)
    e0 = spark.read.parquet(out).filter("_epoch = 0")
    assert e0.count() == 1
    # epoch 1: a LATE error event lands between the view and the click
    sink(df([(1, 4, "error", 3 * H // 2)]), 1)
    e1 = spark.read.parquet(out).filter("_epoch = 1")
    assert e1.count() == 0  # the occurrence is retracted, not appended-to
    assert sink.epochs == [0, 1]  # the sink tracks its commits explicitly
    # checkpoint-recovery RE-DELIVERY of epoch 1: the per-epoch overwrite
    # must leave the accumulated prefix (and thus every re-match) unchanged
    # -- an appending sink would double the late event, shift every seq,
    # and corrupt the state
    sink(df([(1, 4, "error", 3 * H // 2)]), 1)
    assert spark.read.parquet(state).count() == 4
    assert spark.read.parquet(out).filter("_epoch = 1").count() == 0


def test_run_cep_stream_final_empty_epoch_is_the_answer(spark, tmp_path):
    """End-to-end late-arrival retraction through run_cep_stream: when the
    FINAL micro-batch's re-match is EMPTY, the empty set IS the answer --
    a max(_epoch)-over-emitted-rows selection would resolve to the earlier
    epoch and resurrect the retracted occurrence (ADVICE r12, medium)."""
    import os

    from postgresql_datawarehouse_excercise_spark.streaming.cep_stream import (
        run_cep_stream,
    )

    H = 3600 * 1000000
    pattern = [("view", "1"), ("click", "+"), ("purchase", "1")]

    def df(rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, t long"
        ).selectExpr("user_id", "event_id", "event_type",
                     "timestamp_micros(t) AS ts")

    src = str(tmp_path / "src")
    # file 1 (older mtime): a complete consecutive match; file 2 (newer):
    # ONLY the late error that lands between the view and the click.  The
    # file source processes files in mtime order, so the retraction batch
    # is the final epoch and the final match set is empty.
    d1 = df([(1, 1, "view", 1 * H), (1, 2, "click", 2 * H),
             (1, 3, "purchase", 3 * H)])
    d2 = df([(1, 4, "error", 3 * H // 2)])
    d1.coalesce(1).write.mode("overwrite").parquet(f"{src}/f1")
    d2.coalesce(1).write.mode("overwrite").parquet(f"{src}/f2")
    files1 = [f for f in os.listdir(f"{src}/f1") if f.endswith(".parquet")]
    files2 = [f for f in os.listdir(f"{src}/f2") if f.endswith(".parquet")]
    os.rename(f"{src}/f1/{files1[0]}", f"{src}/a.parquet")
    os.rename(f"{src}/f2/{files2[0]}", f"{src}/b.parquet")
    import shutil

    shutil.rmtree(f"{src}/f1")
    shutil.rmtree(f"{src}/f2")
    os.utime(f"{src}/a.parquet", (1_000_000_000, 1_000_000_000))
    os.utime(f"{src}/b.parquet", (1_000_000_100, 1_000_000_100))

    out = str(tmp_path / "out")
    m = run_cep_stream(
        spark, src, d1.schema, str(tmp_path / "state"), out, pattern, 24 * H
    )
    assert m.count() == 0  # retracted: the empty final epoch is authoritative
    # the provisional epoch DID report the match (so the empty answer is a
    # real revision, not a no-op stream)
    assert spark.read.parquet(out).filter("_epoch = 0").count() == 1


def _model_skip_past(rows, pattern, max_span_us):
    """Greedy leftmost non-overlapping chain over the full occurrence
    set: re-walk _model_match's traversal tracking positions, sort by
    start, keep an occurrence iff it starts after the last kept end."""
    n = len(rows)

    def alts(etype):
        return set(etype.split("|"))

    def run_len(pos, etype):
        r = 0
        while pos + r < n and rows[pos + r][2] in alts(etype):
            r += 1
        return r

    def go(pos, si, counts):
        if si == len(pattern):
            yield pos, counts
            return
        etype, quant = pattern[si]
        if quant in ("?", "*"):
            yield from go(pos, si + 1, counts + [0])
        if pos >= n:
            return
        if quant in ("1", "?"):
            if rows[pos][2] in alts(etype):
                yield from go(pos + 1, si + 1, counts + [1])
        else:
            r = run_len(pos, etype)
            if r >= 1:
                yield from go(pos + r, si + 1, counts + [r])

    first_alts = alts(pattern[0][0])
    occ = []
    for start in range(n):
        if rows[start][2] not in first_alts:
            continue
        if pattern[0][1] == "+" and start > 0 and rows[start - 1][2] in first_alts:
            continue
        for end, counts in go(start, 0, []):
            t0, t1 = rows[start][0], rows[end - 1][0]
            if t1 - t0 <= max_span_us:
                occ.append((start, end - 1,
                            (t0, t1, t1 - t0, sum(counts), *counts)))
    occ.sort()
    kept, last_end = [], -1
    for s, e, payload in occ:
        if s > last_end:
            kept.append(payload)
            last_end = e
    return kept


def test_cep_skip_past_matches_python_model(spark):
    """AFTER MATCH SKIP PAST LAST ROW, three ways on the real corpus:
    python greedy chain == Spark applyInPandas chain == the recursive-CTE
    oracle -- on a pattern whose occurrences genuinely overlap (the
    closing purchase of one error-bracket opens the next)."""
    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_skip_past,
        compile_sql_skip_past,
    )

    pattern = [("purchase", "1"), ("error", "+"), ("purchase", "1")]
    by_user = _real_corpus_by_user()
    expect = []
    for u, rows in by_user.items():
        for m in _model_skip_past(rows, pattern, MAX_US):
            expect.append((u, *m))
    # the full set must actually contain overlaps for this to test anything
    n_all = sum(
        len(_model_match(rows, pattern, MAX_US)) for rows in by_user.values()
    )
    assert n_all > len(expect) > 0

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    got = sorted(
        tuple(r) for r in cep_match_skip_past(events, pattern, MAX_US).collect()
    )
    assert got == sorted(expect)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{SF}/events.parquet')"
    )
    sql_rows = con.execute(compile_sql_skip_past(pattern, MAX_US)).fetchall()
    assert sorted(map(tuple, sql_rows)) == sorted(expect)


def test_cep_permute_three_way(spark):
    """PERMUTE(b, c): python model (union of the orderings with an order
    tag) == Spark arm union == the compile_sql_permute replay, on a
    seeded synthetic stream dense enough that BOTH orderings fire (the
    sf0.001 real corpus has no 4-event strict-contiguity permute hits --
    the sf0.01 gate corpus has 10)."""
    import itertools

    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_permute,
        compile_sql_permute,
    )

    rng = random.Random(31337)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(500):
            t += rng.randint(1, 1800) * 1000000
            rows.append((u, eid, rng.choice(["a", "b", "c", "p"]), t))
            eid += 1
    span = 6 * 3600 * 1000000
    prefix, types, suffix = [("a", "1")], ["b", "c"], [("p", "1")]

    by_user = defaultdict(list)
    for u, e, et, t in rows:
        by_user[u].append((t, e, et))
    for rs in by_user.values():
        rs.sort()
    expect = set()
    for perm in itertools.permutations(types):
        pat = list(prefix) + [(t, "1") for t in perm] + list(suffix)
        tag = ",".join(perm)
        for u, rs in by_user.items():
            for m in _model_match(rs, pat, span):
                expect.add((u, *m, tag))
    tags = {e[-1] for e in expect}
    assert tags == {"b,c", "c,b"}  # both orders fire

    df = spark.createDataFrame(
        [(u, e, et, t) for u, e, et, t in rows],
        "user_id long, event_id long, event_type string, t long",
    ).selectExpr("user_id", "event_id", "event_type",
                 "timestamp_micros(t) AS ts")
    got = {
        tuple(r)
        for r in cep_match_permute(df, prefix, types, suffix, span).collect()
    }
    assert got == expect

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " make_timestamp(t) AS ts FROM (SELECT * FROM (VALUES "
        + ",".join(f"({u},{e},'{et}',{t})" for u, e, et, t in rows)
        + ") v(user_id, event_id, event_type, t))"
    )
    sql_rows = con.execute(
        compile_sql_permute(prefix, types, suffix, span)
    ).fetchall()
    assert {tuple(r) for r in sql_rows} == expect

    with pytest.raises(ValueError):
        cep_match_permute(df, prefix, ["b"], suffix, span)
    with pytest.raises(ValueError):
        cep_match_permute(df, prefix, ["b", "b"], suffix, span)


def _model_match_members(rows, members, quants, max_span_us):
    """Generalized model: stage membership is an arbitrary function of
    (row, previous stream row) -- the independent leg for DEFINE
    predicates.  rows: [(t_us, eid, etype, value)] sorted; members[i] =
    f(row, prev_row_or_None) -> bool; quants[i] in 1 ? + *."""
    n = len(rows)

    def member(i, pos):
        prev = rows[pos - 1] if pos > 0 else None
        return members[i](rows[pos], prev)

    def run_len(i, pos):
        r = 0
        while pos + r < n and member(i, pos + r):
            r += 1
        return r

    def go(pos, si, counts):
        if si == len(members):
            yield pos, counts
            return
        q = quants[si]
        if q in ("?", "*"):
            yield from go(pos, si + 1, counts + [0])
        if pos >= n:
            return
        if q in ("1", "?"):
            if member(si, pos):
                yield from go(pos + 1, si + 1, counts + [1])
        else:
            r = run_len(si, pos)
            if r >= 1:
                yield from go(pos + r, si + 1, counts + [r])

    out = set()
    for start in range(n):
        if not member(0, start):
            continue
        if quants[0] == "+" and start > 0 and member(0, start - 1):
            continue  # only maximal-run starts anchor (whole-island joins)
        for end, counts in go(start, 0, []):
            t0, t1 = rows[start][0], rows[end - 1][0]
            if t1 - t0 <= max_span_us:
                out.add((t0, t1, t1 - t0, sum(counts), *counts))
    return out


def test_cep_define_three_way(spark):
    """DEFINE predicate symbols (round 14), three ways on a seeded
    synthetic stream with a small value alphabet (dense rising ties and
    stream-head NULLs): independent membership-function model == Spark
    lag-column lane == compile_sql's DuckDB replay.  The IS-TRUE collapse
    is modelled independently: PREV at the stream head makes the raw
    comparison NULL -> the positive symbol is false, its NOT() true."""
    rng = random.Random(20240814)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(400):
            t += rng.randint(1, 1800) * 1000000
            rows.append(
                (u, eid, rng.choice(["a", "p"]), t, float(rng.randint(1, 5)))
            )
            eid += 1
    span = 8 * 3600 * 1000000

    by_user = defaultdict(list)
    for u, e, et, t, v in rows:
        by_user[u].append((t, e, et, v))
    for rs in by_user.values():
        rs.sort()

    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, t long, value double",
    ).selectExpr("user_id", "event_id", "event_type",
                 "timestamp_micros(t) AS ts", "value")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " make_timestamp(t) AS ts, value FROM (SELECT * FROM (VALUES "
        + ",".join(f"({u},{e},'{et}',{t},{v})" for u, e, et, t, v in rows)
        + ") v(user_id, event_id, event_type, t, value))"
    )

    def rising(row, prev):
        return prev is not None and row[3] > prev[3]

    cases = [
        # the rising-run idiom: anchor = non-rising purchase (or stream
        # head), run = strictly rising purchases
        (
            [("p", "1", "NOT (value > PREV(value))"),
             ("p", "+", "value > PREV(value)")],
            [lambda r, p: r[2] == "p" and not rising(r, p),
             lambda r, p: r[2] == "p" and rising(r, p)],
        ),
        # literal threshold on a quantified stage
        (
            [("a", "1"), ("p", "+", "value >= 3.0")],
            [lambda r, p: r[2] == "a",
             lambda r, p: r[2] == "p" and r[3] >= 3.0],
        ),
        # optional pred stage plus a conjunction with PREV; the two "a"
        # anchors become adjacent when the "*" is empty, so they carry
        # provably-disjoint literal intervals (> 2 vs <= 2)
        (
            [("a", "1", "value > 2.0"),
             ("p", "*", "value > PREV(value) AND value >= 2.0"),
             ("a", "1", "value <= 2.0")],
            [lambda r, p: r[2] == "a" and r[3] > 2.0,
             lambda r, p: r[2] == "p" and rising(r, p) and r[3] >= 2.0,
             lambda r, p: r[2] == "a" and r[3] <= 2.0],
        ),
        # round 15: OR disjunction -- in-band run then OUT-of-band run,
        # provably disjoint as interval sets (out = (-inf,2) u (4,inf)
        # vs in = [2,4]: every cross pair of intervals disjoint)
        (
            [("p", "+", "value >= 2.0 AND value <= 4.0"),
             ("p", "+", "value < 2.0 OR value > 4.0")],
            [lambda r, p: r[2] == "p" and 2.0 <= r[3] <= 4.0,
             lambda r, p: r[2] == "p" and (r[3] < 2.0 or r[3] > 4.0)],
        ),
        # OR with its exact negation (partition regardless of shape)
        (
            [("p", "1", "NOT (value < 2.0 OR value > 4.0)"),
             ("p", "+", "value < 2.0 OR value > 4.0")],
            [lambda r, p: r[2] == "p" and not (r[3] < 2.0 or r[3] > 4.0),
             lambda r, p: r[2] == "p" and (r[3] < 2.0 or r[3] > 4.0)],
        ),
    ]
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match as _cm,
    )

    for pattern, members in cases:
        quants = [st[1] for st in pattern]
        expect = set()
        for u, rs in by_user.items():
            for m in _model_match_members(rs, members, quants, span):
                expect.add((u, *m))
        assert len(expect) > 5, pattern
        got = {tuple(r) for r in _cm(df, pattern, span).collect()}
        assert got == expect, pattern
        sql_rows = con.execute(compile_sql(pattern, span)).fetchall()
        assert {tuple(r) for r in sql_rows} == expect, pattern


def test_cep_define_validation(spark):
    """DEFINE-specific validation: overlapping types are legal ONLY under
    provably-disjoint predicates (exact negation / disjoint literal
    intervals / disjoint operator regions on the SAME row-local bound);
    anything unprovable is rejected; bad predicate syntax and
    non-identifier columns are rejected at parse time."""
    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match as _cm,
    )

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    ok = [
        [("purchase", "1", "NOT (value > PREV(value))"),
         ("purchase", "+", "value > PREV(value)")],
        [("purchase", "1", "value < 100"), ("purchase", "+", "value >= 100")],
        [("purchase", "1", "value = 5"), ("purchase", "+", "value != 5")],
        # round 15: disjoint operator regions on the SAME row-local bound
        [("purchase", "1", "value < PREV(value)"),
         ("purchase", "+", "value > PREV(value)")],
        # round 15: OR unions of literal intervals
        [("purchase", "1", "value < 10 OR value > 100"),
         ("purchase", "+", "value >= 10 AND value <= 100")],
        [("purchase", "1", "value = 1 OR value = 3"),
         ("purchase", "+", "value = 2 OR value = 4")],
    ]
    for pat in ok:
        assert _cm(events, pat, MAX_US).columns  # validates + compiles
    bad = [
        # same types, predicates overlap (not provably disjoint)
        [("purchase", "1", "value > 10"), ("purchase", "+", "value > 20")],
        # one side has no predicate at all
        [("purchase", "1"), ("purchase", "+", "value > PREV(value)")],
        # closed boundary point shared
        [("purchase", "1", "value >= 100"), ("purchase", "+", "value <= 100")],
        # same row-local bound but operator regions share the equality point
        [("purchase", "1", "value <= PREV(value)"),
         ("purchase", "+", "value >= PREV(value)")],
        # disjoint operator regions but DIFFERENT row-local bounds
        [("purchase", "1", "value < PREV(value)"),
         ("purchase", "+", "value > NEXT(value)")],
        # OR union overlapping the other side's interval
        [("purchase", "1", "value < 30 OR value > 100"),
         ("purchase", "+", "value >= 10 AND value <= 100")],
        # OR over a PREV bound: outside the interval-set fragment
        [("purchase", "1", "value < PREV(value) OR value > 100"),
         ("purchase", "+", "value >= 10 AND value <= 100")],
    ]
    for pat in bad:
        with pytest.raises(ValueError):
            _cm(events, pat, MAX_US)
    for text in ["value ~ 5", "value > PREV(value'); --", "1value > 2",
                 "value > value2 + 1",
                 "value < 10 OR value > 100 AND value < 200"]:
        with pytest.raises(ValueError):
            _cm(events, [("view", "1", text), ("click", "+")], MAX_US)


def _model_skip_to(rows, pattern, max_span_us, target, which):
    """SKIP TO FIRST/LAST model: full occurrence set with positions, then
    the per-user greedy fold whose resume row is the prefix-sum locator
    of the target stage's first/last consumed row."""
    n = len(rows)

    def alts(etype):
        return set(etype.split("|"))

    def run_len(pos, etype):
        r = 0
        while pos + r < n and rows[pos + r][2] in alts(etype):
            r += 1
        return r

    def go(pos, si, counts):
        if si == len(pattern):
            yield pos, counts
            return
        etype, quant = pattern[si]
        if quant in ("?", "*"):
            yield from go(pos, si + 1, counts + [0])
        if pos >= n:
            return
        if quant in ("1", "?"):
            if rows[pos][2] in alts(etype):
                yield from go(pos + 1, si + 1, counts + [1])
        else:
            r = run_len(pos, etype)
            if r >= 1:
                yield from go(pos + r, si + 1, counts + [r])

    first_alts = alts(pattern[0][0])
    occ = []
    for start in range(n):
        if rows[start][2] not in first_alts:
            continue
        if pattern[0][1] == "+" and start > 0 and rows[start - 1][2] in first_alts:
            continue
        for end, counts in go(start, 0, []):
            t0, t1 = rows[start][0], rows[end - 1][0]
            if t1 - t0 <= max_span_us:
                upto = target if which == "first" else target + 1
                resume = start + sum(counts[:upto]) - (
                    1 if which == "last" else 0
                )
                occ.append((start, end - 1, resume,
                            (t0, t1, t1 - t0, sum(counts), *counts)))
    occ.sort()
    kept, pos = [], 0
    for s, e, r, payload in occ:
        if s >= pos:
            kept.append(payload)
            assert r > s
            pos = r
    return kept


@pytest.mark.parametrize("pattern,target,which", [
    ([("purchase", "1"), ("view", "+"), ("purchase", "1"), ("view", "+")],
     2, "first"),
    ([("purchase", "1"), ("view", "+"), ("purchase", "1")], 1, "last"),
    ([("purchase", "1"), ("error", "+"), ("purchase", "1")], 2, "first"),
])
def test_cep_skip_to_three_way(spark, pattern, target, which):
    """SKIP TO FIRST/LAST, three ways on the real corpus: python fold ==
    Spark applyInPandas fold == the >=-chained recursive-CTE oracle; and
    on the 3-stage patterns the selection must KEEP more than SKIP PAST
    LAST ROW would (overlap through the shared boundary row is the whole
    point of the mode)."""
    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_skip_to,
        compile_sql_skip_to,
    )

    by_user = _real_corpus_by_user()
    expect = []
    for u, rows in by_user.items():
        for m in _model_skip_to(rows, pattern, MAX_US, target, which):
            expect.append((u, *m))
    assert len(expect) > 0

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    got = sorted(
        tuple(r)
        for r in cep_match_skip_to(
            events, pattern, MAX_US, target, which
        ).collect()
    )
    assert got == sorted(expect)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{SF}/events.parquet')"
    )
    sql_rows = con.execute(
        compile_sql_skip_to(pattern, MAX_US, target, which)
    ).fetchall()
    assert sorted(map(tuple, sql_rows)) == sorted(expect)


def test_cep_skip_to_validation(spark):
    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_skip_to,
    )

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    pat = [("purchase", "1"), ("view", "+"), ("purchase", "1")]
    for target, which in [
        (0, "first"),   # no non-empty-able stage before the target
        (0, "last"),
        (3, "first"),   # out of range
        (1, "both"),    # bad mode
    ]:
        with pytest.raises(ValueError):
            cep_match_skip_to(events, pat, MAX_US, target, which)
    # an empty-able target is rejected even mid-pattern
    pat2 = [("purchase", "1"), ("view", "*"), ("purchase", "1")]
    with pytest.raises(ValueError):
        cep_match_skip_to(events, pat2, MAX_US, 1, "first")


def test_cep_measures_three_way(spark):
    """MEASURES (round 14), three ways on a seeded synthetic stream:
    independent model (per-stage consumed index intervals -> cents
    aggregates) == Spark run-aggregate lane == compile_sql's
    min_by/max_by replay.  Covers: first/sum/min/last on '1' and '+'
    stages, NULL on an empty '?' arm, measures composed WITH a DEFINE
    predicate."""
    import math

    rng = random.Random(777)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(400):
            t += rng.randint(1, 1800) * 1000000
            rows.append(
                (u, eid, rng.choice(["a", "b", "p"]), t,
                 round(rng.uniform(0.5, 30.0), 2))
            )
            eid += 1
    span = 8 * 3600 * 1000000

    by_user = defaultdict(list)
    for u, e, et, t, v in rows:
        by_user[u].append((t, e, et, v))
    for rs in by_user.values():
        rs.sort()

    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, t long, value double",
    ).selectExpr("user_id", "event_id", "event_type",
                 "timestamp_micros(t) AS ts", "value")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " make_timestamp(t) AS ts, value FROM (SELECT * FROM (VALUES "
        + ",".join(f"({u},{e},'{et}',{t},{v})" for u, e, et, t, v in rows)
        + ") v(user_id, event_id, event_type, t, value))"
    )

    def cents(v):
        return int(math.floor(v * 100 + 0.5))

    def model(rs, members, quants, measures):
        """Occurrences with per-stage measures over consumed intervals."""
        n = len(rs)

        def member(i, pos):
            return members[i](rs[pos], rs[pos - 1] if pos > 0 else None)

        def go(pos, si, segs):
            if si == len(members):
                yield pos, segs
                return
            q = quants[si]
            if q in ("?", "*"):
                yield from go(pos, si + 1, segs + [(pos, 0)])
            if pos >= n:
                return
            if q in ("1", "?"):
                if member(si, pos):
                    yield from go(pos + 1, si + 1, segs + [(pos, 1)])
            else:
                r = 0
                while pos + r < n and member(si, pos + r):
                    r += 1
                if r >= 1:
                    yield from go(pos + r, si + 1, segs + [(pos, r)])

        out = set()
        for start in range(n):
            if not member(0, start):
                continue
            if quants[0] == "+" and start > 0 and member(0, start - 1):
                continue
            for end, segs in go(start, 0, []):
                t0, t1 = rs[start][0], rs[end - 1][0]
                if t1 - t0 > span:
                    continue
                mvals = []
                for idx, agg, _c, _a in measures:
                    s0, cnt = segs[idx]
                    vals = [cents(rs[s0 + j][3]) for j in range(cnt)]
                    if not vals:
                        mvals.append(None)
                    else:
                        mvals.append({
                            "sum": sum(vals), "min": min(vals),
                            "max": max(vals), "first": vals[0],
                            "last": vals[-1],
                        }[agg])
                counts = [c for _, c in segs]
                out.add((t0, t1, t1 - t0, sum(counts), *counts, *mvals))
        return out

    cases = [
        (
            [("a", "1"), ("b", "?"), ("p", "+")],
            [lambda r, p: r[2] == "a", lambda r, p: r[2] == "b",
             lambda r, p: r[2] == "p"],
            [(0, "first", "value", "a_c"), (1, "sum", "value", "b_c"),
             (2, "sum", "value", "p_sum_c"), (2, "last", "value", "p_last_c")],
        ),
        (
            [("p", "1", "NOT (value > PREV(value))"),
             ("p", "+", "value > PREV(value)")],
            [lambda r, p: r[2] == "p" and not (p is not None and r[3] > p[3]),
             lambda r, p: r[2] == "p" and (p is not None and r[3] > p[3])],
            [(1, "sum", "value", "run_sum_c"), (1, "min", "value", "run_min_c"),
             (0, "first", "value", "anchor_c")],
        ),
    ]
    for pattern, members, measures in cases:
        quants = [st[1] for st in pattern]
        expect = set()
        for u, rs in by_user.items():
            for m in model(rs, members, quants, measures):
                expect.add((u, *m))
        assert len(expect) > 5, pattern
        got = {
            tuple(r)
            for r in cep_match(df, pattern, span, measures=measures).collect()
        }
        assert got == expect, pattern
        sql_rows = con.execute(
            compile_sql(pattern, span, measures=measures)
        ).fetchall()
        assert {tuple(r) for r in sql_rows} == expect, pattern
    # NULL-on-empty actually exercised in case 1
    pattern, members, measures = cases[0]
    some_null = any(
        m is None
        for u, rs in by_user.items()
        for occ in model(rs, members, [s[1] for s in pattern], measures)
        for m in occ[-len(measures):]
    )
    assert some_null


def test_cep_measures_validation(spark):
    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    pat = [("view", "1"), ("click", "+"), ("purchase", "1")]
    for bad in [
        [(5, "sum", "value", "x")],            # stage out of range
        [(1, "avg", "value", "x")],            # unknown agg
        [(1, "sum", "value; --", "x")],        # non-identifier col
        [(1, "sum", "value", "x"), (2, "min", "value", "x")],  # dup alias
        [(1, "sum")],                          # wrong arity
    ]:
        with pytest.raises(ValueError):
            cep_match(events, pat, MAX_US, measures=bad)


def test_cep_all_rows_three_way(spark):
    """ALL ROWS PER MATCH, three ways on the real corpus: an independent
    model (occurrence positions -> per-row classifier via prefix sums,
    match_no by start order) == Spark join-back lane == compile_sql_rows.
    Overlapping occurrences must repeat shared rows once per match."""
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_rows,
        compile_sql_rows,
    )

    # overlapping pattern: the closing purchase opens the next bracket
    pattern = [("purchase", "1"), ("error", "+"), ("purchase", "1")]
    by_user = _real_corpus_by_user()
    expect = []
    for u, rows in by_user.items():
        occ = []
        n = len(rows)

        def run_len(pos):
            r = 0
            while pos + r < n and rows[pos + r][2] == "error":
                r += 1
            return r

        for start in range(n):
            if rows[start][2] != "purchase":
                continue
            r = run_len(start + 1)
            if r >= 1 and start + 1 + r < n and rows[start + 1 + r][2] == "purchase":
                end = start + 1 + r
                if rows[end][0] - rows[start][0] <= MAX_US:
                    occ.append((start, end, [1, r, 1]))
        occ.sort()
        for mno, (s, e, counts) in enumerate(occ, start=1):
            for pos in range(s, e + 1):
                off = pos - s
                acc, clf = 0, None
                for i, c in enumerate(counts):
                    acc += c
                    if off < acc:
                        clf = i
                        break
                t, eid, et = rows[pos]
                expect.append((u, mno, pos + 1, eid, et, t, clf))
    assert len(expect) > 0

    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    got = sorted(
        tuple(r) for r in cep_match_rows(events, pattern, MAX_US).collect()
    )
    assert got == sorted(expect)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{SF}/events.parquet')"
    )
    sql_rows = con.execute(compile_sql_rows(pattern, MAX_US)).fetchall()
    assert sorted(map(tuple, sql_rows)) == sorted(expect)


def test_stream_cep_with_define_pattern(spark, tmp_path):
    """The streaming replay sink composes with DEFINE predicates for free
    (patterns are data): a rising-value run is reported at epoch 0, and a
    late event landing INSIDE the run both breaks contiguity and resets
    the PREV() chain -- the revised epoch must retract it."""
    from postgresql_datawarehouse_excercise_spark.streaming.cep_stream import (
        cep_replay_sink,
    )

    H = 3600 * 1000000
    pattern = [("p", "1", "NOT (value > PREV(value))"),
               ("p", "+", "value > PREV(value)")]

    def df(rows):
        return spark.createDataFrame(
            rows,
            "user_id long, event_id long, event_type string, t long,"
            " value double",
        ).selectExpr("user_id", "event_id", "event_type",
                     "timestamp_micros(t) AS ts", "value")

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    sink = cep_replay_sink(spark, state, out, pattern, 24 * H)
    # epoch 0: anchor 5.0, rising 6.0 -> 9.0: one occurrence, n_stage1=2
    sink(df([(1, 1, "p", 1 * H, 5.0), (1, 2, "p", 2 * H, 6.0),
             (1, 3, "p", 3 * H, 9.0)]), 0)
    e0 = spark.read.parquet(out).filter("_epoch = 0").collect()
    assert len(e0) == 1 and e0[0]["n_stage1"] == 2
    # epoch 1: a LATE low value lands between the 6.0 and the 9.0 --
    # the run breaks (6.0 -> 2.0 not rising); the revision is two shorter
    # occurrences: [5,6] (anchor 5, rising 6) and [2,9] (anchor 2, rising 9)
    sink(df([(1, 4, "p", 5 * H // 2, 2.0)]), 1)
    e1 = sorted(
        (r["n_stage1"], r["t_first_us"])
        for r in spark.read.parquet(out).filter("_epoch = 1").collect()
    )
    assert e1 == [(1, 1 * H), (1, 5 * H // 2)]


def _model_members_measures(rs, members, quants, measures, span):
    """Standalone membership-function model WITH measures (the hypothesis
    sweep's leg; mirrors the nested model in test_cep_measures_three_way)."""
    import math

    n = len(rs)

    def member(i, pos):
        return members[i](rs[pos], rs[pos - 1] if pos > 0 else None)

    def cents(v):
        return int(math.floor(v * 100 + 0.5))

    def go(pos, si, segs):
        if si == len(members):
            yield pos, segs
            return
        q = quants[si]
        if q in ("?", "*"):
            yield from go(pos, si + 1, segs + [(pos, 0)])
        if pos >= n:
            return
        if q in ("1", "?"):
            if member(si, pos):
                yield from go(pos + 1, si + 1, segs + [(pos, 1)])
        else:
            r = 0
            while pos + r < n and member(si, pos + r):
                r += 1
            if r >= 1:
                yield from go(pos + r, si + 1, segs + [(pos, r)])

    out = set()
    for start in range(n):
        if not member(0, start):
            continue
        if quants[0] == "+" and start > 0 and member(0, start - 1):
            continue
        for end, segs in go(start, 0, []):
            t0, t1 = rs[start][0], rs[end - 1][0]
            if t1 - t0 > span:
                continue
            mvals = []
            for idx, agg, _c, _a in measures:
                s0, cnt = segs[idx]
                vals = [cents(rs[s0 + j][3]) for j in range(cnt)]
                mvals.append(
                    None if not vals else {
                        "sum": sum(vals), "min": min(vals), "max": max(vals),
                        "first": vals[0], "last": vals[-1],
                    }[agg]
                )
            counts = [c for _, c in segs]
            out.add((t0, t1, t1 - t0, sum(counts), *counts, *mvals))
    return out


def test_cep_subset_measures_three_way(spark):
    """SUBSET union symbols for MEASURES (round 15), three ways on a
    seeded valued stream.  The independent model aggregates the UNION of
    consumed rows DIRECTLY (member stages' spans concatenated in stream
    order), while the engine COMPOSES per-stage aggregates (sum of sums,
    least/greatest, stage-order coalesce) -- agreement proves the
    composition exact, including NULL on an all-empty union and
    first/last crossing an empty middle member."""
    import math

    rng = random.Random(91507)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(400):
            t += rng.randint(1, 1800) * 1000000
            rows.append(
                (u, eid, rng.choice(["a", "b", "p"]), t,
                 float(rng.randint(1, 5)))
            )
            eid += 1
    span = 8 * 3600 * 1000000

    by_user = defaultdict(list)
    for u, e, et, t, v in rows:
        by_user[u].append((t, e, et, v))
    for rs in by_user.values():
        rs.sort()

    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, t long, value double",
    ).selectExpr("user_id", "event_id", "event_type",
                 "timestamp_micros(t) AS ts", "value")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " make_timestamp(t) AS ts, value FROM (SELECT * FROM (VALUES "
        + ",".join(f"({u},{e},'{et}',{t},{v})" for u, e, et, t, v in rows)
        + ") v(user_id, event_id, event_type, t, value))"
    )

    pattern = [("a", "1"), ("b", "*"), ("p", "1")]
    members = [lambda r, q: r[2] == "a",
               lambda r, q: r[2] == "b",
               lambda r, q: r[2] == "p"]
    quants = ["1", "*", "1"]
    subsets = {"w": [0, 1], "bp": [1, 2], "only_b": [1]}
    measures = [
        ("w", "sum", "value", "w_sum_c"),
        ("w", "last", "value", "w_last_c"),       # crosses empty b
        ("bp", "min", "value", "bp_min_c"),
        ("bp", "first", "value", "bp_first_c"),   # NULL b => first from p
        ("only_b", "sum", "value", "b_sum_c"),    # NULL on empty union
        ("only_b", "max", "value", "b_max_c"),
        (2, "first", "value", "p_c"),             # plain stage ref beside
    ]

    def cents(v):
        return int(math.floor(v * 100 + 0.5))

    def model(rs):
        n = len(rs)

        def member(i, pos):
            return members[i](rs[pos], rs[pos - 1] if pos > 0 else None)

        def go(pos, si, segs):
            if si == len(members):
                yield pos, segs
                return
            q = quants[si]
            if q in ("?", "*"):
                yield from go(pos, si + 1, segs + [(pos, 0)])
            if pos >= n:
                return
            if q in ("1", "?"):
                if member(si, pos):
                    yield from go(pos + 1, si + 1, segs + [(pos, 1)])
            else:
                r = 0
                while pos + r < n and member(si, pos + r):
                    r += 1
                if r >= 1:
                    yield from go(pos + r, si + 1, segs + [(pos, r)])

        out = set()
        for start in range(n):
            if not member(0, start):
                continue
            for end, segs in go(start, 0, []):
                t0, t1 = rs[start][0], rs[end - 1][0]
                if t1 - t0 > span:
                    continue
                mvals = []
                for idx, agg, _c, _a in measures:
                    stage_list = (
                        sorted(subsets[idx]) if isinstance(idx, str)
                        else [idx]
                    )
                    vals = []
                    for i in stage_list:
                        s0, cnt = segs[i]
                        vals.extend(
                            cents(rs[s0 + j][3]) for j in range(cnt)
                        )
                    mvals.append(
                        None if not vals else {
                            "sum": sum(vals), "min": min(vals),
                            "max": max(vals), "first": vals[0],
                            "last": vals[-1],
                        }[agg]
                    )
                counts = [c for _, c in segs]
                out.add((t0, t1, t1 - t0, sum(counts), *counts, *mvals))
        return out

    expect = set()
    for u, rs in by_user.items():
        for m in model(rs):
            expect.add((u, *m))
    assert len(expect) > 20
    assert any(r[-3] is None for r in expect)  # empty-union NULLs occur
    got = {
        tuple(r)
        for r in cep_match(
            df, pattern, span, measures=measures, subsets=subsets
        ).collect()
    }
    assert got == expect
    sql_rows = con.execute(
        compile_sql(pattern, span, measures=measures, subsets=subsets)
    ).fetchall()
    assert {tuple(r) for r in sql_rows} == expect


def test_cep_subset_validation():
    """SUBSET validation: unknown name, empty member list, duplicate
    members, out-of-range index, alias collision with a plain measure."""
    pat = [("a", "1"), ("b", "*"), ("p", "1")]
    span = 1000
    cases = [
        ({"w": [0]}, [("x", "sum", "value", "s")]),       # unknown name
        ({"w": []}, [("w", "sum", "value", "s")]),        # empty
        ({"w": [0, 0]}, [("w", "sum", "value", "s")]),    # duplicate
        ({"w": [0, 7]}, [("w", "sum", "value", "s")]),    # out of range
        ({"w w": [0]}, [("w w", "sum", "value", "s")]),   # bad identifier
        ({"w": [0, 1]},
         [("w", "sum", "value", "s"), (2, "sum", "value", "s")]),  # dup alias
    ]
    for subsets, measures in cases:
        with pytest.raises(ValueError):
            compile_sql(pat, span, measures=measures, subsets=subsets)


def test_cep_round15_hypothesis_sweep():
    """Randomized model-vs-DuckDB sweep over the round-15 second-wave
    constructs: bounded {n,m} (non-final run-length filter AND the final
    greedy cap), OR in DEFINE, SUBSET union measures, and quantified
    cross-symbol targets.  Same discipline as the round-14 sweep: a
    2-type alphabet and 3-value grid force dense runs, band-boundary
    hits, empty optional arms and multi-row target runs; the compiled
    oracle is checked against independent models on ~50 random
    streams (the Spark lane is pinned by the fixed-stream 3-way
    tests)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    span = 7200 * 1000000
    stream = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),      # user
            st.sampled_from(["a", "p"]),                # type
            st.integers(min_value=1, max_value=600),    # inter-event secs
            st.sampled_from([1.0, 2.0, 3.0]),           # value grid
        ),
        min_size=4,
        max_size=40,
    )

    def cents(v):
        return int(math.floor(v * 100 + 0.5))

    def gen_model(rs, members, quants, measures, subsets, span):
        """General model: membership functions, quantifiers incl.
        bounded (final greedy cap), subset-aware measures aggregated
        DIRECTLY over the union of consumed rows."""
        import re as _re

        n = len(rs)

        def member(i, pos):
            return members[i](rs[pos], rs[pos - 1] if pos > 0 else None)

        def go(pos, si, segs):
            if si == len(members):
                yield pos, segs
                return
            q = quants[si]
            rng = _re.match(r"^\{(\d+),(\d*)\}$", q)
            if rng:
                lo = int(rng.group(1))
                hi = int(rng.group(2)) if rng.group(2) else None
                r = 0
                while pos + r < n and member(si, pos + r):
                    r += 1
                if si == len(members) - 1 and hi is not None:
                    if r >= lo:
                        take = min(r, hi)
                        yield from go(pos + take, si + 1, segs + [(pos, take)])
                elif r >= lo and (hi is None or r <= hi):
                    yield from go(pos + r, si + 1, segs + [(pos, r)])
                return
            if q in ("?", "*"):
                yield from go(pos, si + 1, segs + [(pos, 0)])
            if pos >= n:
                return
            if q in ("1", "?"):
                if member(si, pos):
                    yield from go(pos + 1, si + 1, segs + [(pos, 1)])
            else:
                r = 0
                while pos + r < n and member(si, pos + r):
                    r += 1
                if r >= 1:
                    yield from go(pos + r, si + 1, segs + [(pos, r)])

        first_is_run = quants[0] == "+" or quants[0].startswith("{")
        out = set()
        for start in range(n):
            if not member(0, start):
                continue
            if first_is_run and start > 0 and member(0, start - 1):
                continue
            for end, segs in go(start, 0, []):
                t0, t1 = rs[start][0], rs[end - 1][0]
                if t1 - t0 > span:
                    continue
                mvals = []
                for idx, agg, _c, _a in measures:
                    stage_list = (
                        sorted(subsets[idx]) if isinstance(idx, str)
                        else [idx]
                    )
                    vals = []
                    for i in stage_list:
                        s0, cnt = segs[i]
                        vals.extend(
                            cents(rs[s0 + j][3]) for j in range(cnt)
                        )
                    mvals.append(
                        None if not vals else {
                            "sum": sum(vals), "min": min(vals),
                            "max": max(vals), "first": vals[0],
                            "last": vals[-1],
                        }[agg]
                    )
                counts = [c for _, c in segs]
                out.add((t0, t1, t1 - t0, sum(counts), *counts, *mvals))
        return out

    @settings(max_examples=50, deadline=None)
    @given(evs=stream)
    def sweep(evs):
        rows = []
        clocks = {}
        for i, (u, et, dt, v) in enumerate(evs):
            clocks[u] = clocks.get(u, 0) + dt * 1000000
            rows.append((u, i, et, clocks[u], v))
        by_user = defaultdict(list)
        for u, e, et, t, v in rows:
            by_user[u].append((t, e, et, v))
        for rs in by_user.values():
            rs.sort()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
            " make_timestamp(t) AS ts, value FROM (SELECT * FROM (VALUES "
            + ",".join(f"({u},{e},'{et}',{t},{v})" for u, e, et, t, v in rows)
            + ") v(user_id, event_id, event_type, t, value))"
        )

        is_a = lambda r, q: r[2] == "a"          # noqa: E731
        is_p = lambda r, q: r[2] == "p"          # noqa: E731

        # 1. bounded: non-final run-length filter / final greedy cap /
        #    open upper bound, pred-less
        for pat, members in (
            ([("a", "1"), ("p", "{2,3}"), ("a", "1")], [is_a, is_p, is_a]),
            ([("a", "1"), ("p", "{1,2}")], [is_a, is_p]),
            ([("p", "{2,}"), ("a", "1")], [is_p, is_a]),
        ):
            quants = [st[1] for st in pat]
            expect = set()
            for u, rs in by_user.items():
                for m in gen_model(rs, members, quants, [], {}, span):
                    expect.add((u, *m))
            got = {
                tuple(r)
                for r in con.execute(compile_sql(pat, span)).fetchall()
            }
            assert got == expect, pat

        # 2. OR in DEFINE (band split on the 3-value grid) + SUBSET
        #    union measures over both same-type stages
        OR_PAT = [("p", "+", "value >= 2.0 AND value <= 2.0"),
                  ("p", "+", "value < 2.0 OR value > 2.0")]
        OR_MEMBERS = [lambda r, q: r[2] == "p" and r[3] == 2.0,
                      lambda r, q: r[2] == "p" and r[3] != 2.0]
        SUBS = {"w": [0, 1]}
        SMEAS = [("w", "sum", "value", "w_sum_c"),
                 ("w", "last", "value", "w_last_c"),
                 (0, "first", "value", "in_first_c")]
        expect = set()
        for u, rs in by_user.items():
            for m in gen_model(
                rs, OR_MEMBERS, ["+", "+"], SMEAS, SUBS, span
            ):
                expect.add((u, *m))
        got = {
            tuple(r)
            for r in con.execute(
                compile_sql(OR_PAT, span, measures=SMEAS, subsets=SUBS)
            ).fetchall()
        }
        assert got == expect

        # 3. quantified cross-symbol target: a-run each above the
        #    p-RUN's LAST value (running last-row semantics)
        X_PAT = [("p", "+"), ("a", "+", "value > p.value")]
        expect = set()
        for u, rs in by_user.items():
            n = len(rs)
            for s in range(n):
                if rs[s][2] != "p" or (s > 0 and rs[s - 1][2] == "p"):
                    continue
                k = 0
                while s + k < n and rs[s + k][2] == "p":
                    k += 1
                anchor = rs[s + k - 1][3]
                r = 0
                while (
                    s + k + r < n
                    and rs[s + k + r][2] == "a"
                    and rs[s + k + r][3] > anchor
                ):
                    r += 1
                end = s + k + r - 1
                if r >= 1 and rs[end][0] - rs[s][0] <= span:
                    expect.add(
                        (u, rs[s][0], rs[end][0], rs[end][0] - rs[s][0],
                         k + r, k, r)
                    )
        got = {
            tuple(r)
            for r in con.execute(compile_sql(X_PAT, span)).fetchall()
        }
        assert got == expect

    sweep()


def test_cep_extensions_hypothesis_sweep():
    """Randomized model-vs-DuckDB sweep over the round-14 CEP extensions
    (DEFINE + measures + skip-to): tiny alphabets and a 3-value grid force
    dense rising TIES, stream-head NULLs, empty optional arms, and
    overlapping skip-to chains -- the regime where boundary semantics
    hide (the discipline that caught the round-13 session-gap bug).  No
    Spark per example (the 3-way tests pin the Spark lane on fixed
    streams); this sweeps the COMPILED ORACLE against the independent
    model on ~60 random streams."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        compile_sql_skip_to,
    )

    span = 7200 * 1000000

    stream = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),      # user
            st.sampled_from(["a", "p"]),                # type
            st.integers(min_value=1, max_value=600),    # inter-event secs
            st.sampled_from([1.0, 2.0, 3.0]),           # value grid (ties)
        ),
        min_size=4,
        max_size=40,
    )

    def rising(r, p):
        return p is not None and r[3] > p[3]

    DEFINE_PAT = [("p", "1", "NOT (value > PREV(value))"),
                  ("p", "+", "value > PREV(value)")]
    DEFINE_MEMBERS = [
        lambda r, p: r[2] == "p" and not rising(r, p),
        lambda r, p: r[2] == "p" and rising(r, p),
    ]
    MEAS = [(0, "first", "value", "anchor_c"), (1, "sum", "value", "run_sum_c"),
            (1, "last", "value", "run_last_c")]
    SKIP_PAT = [("a", "1"), ("p", "+"), ("a", "1")]

    @settings(max_examples=60, deadline=None)
    @given(evs=stream)
    def sweep(evs):
        rows = []
        clocks = {}
        for i, (u, et, dt, v) in enumerate(evs):
            clocks[u] = clocks.get(u, 0) + dt * 1000000
            rows.append((u, i, et, clocks[u], v))
        by_user = defaultdict(list)
        for u, e, et, t, v in rows:
            by_user[u].append((t, e, et, v))
        for rs in by_user.values():
            rs.sort()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
            " make_timestamp(t) AS ts, value FROM (SELECT * FROM (VALUES "
            + ",".join(f"({u},{e},'{et}',{t},{v})" for u, e, et, t, v in rows)
            + ") v(user_id, event_id, event_type, t, value))"
        )
        # DEFINE + measures
        expect = set()
        for u, rs in by_user.items():
            for m in _model_members_measures(
                rs, DEFINE_MEMBERS, ["1", "+"], MEAS, span
            ):
                expect.add((u, *m))
        got = {
            tuple(r)
            for r in con.execute(
                compile_sql(DEFINE_PAT, span, measures=MEAS)
            ).fetchall()
        }
        assert got == expect
        # SKIP TO LAST on the multi-row middle symbol
        expect2 = []
        for u, rs in by_user.items():
            rs3 = [(t, e, et) for t, e, et, _ in rs]
            for m in _model_skip_to(rs3, SKIP_PAT, span, 1, "last"):
                expect2.append((u, *m))
        got2 = sorted(
            map(tuple, con.execute(
                compile_sql_skip_to(SKIP_PAT, span, 1, "last")
            ).fetchall())
        )
        assert got2 == sorted(expect2)
        # SKIP TO FIRST of the same symbol (resume at the run's first row)
        expect3 = []
        for u, rs in by_user.items():
            rs3 = [(t, e, et) for t, e, et, _ in rs]
            for m in _model_skip_to(rs3, SKIP_PAT, span, 1, "first"):
                expect3.append((u, *m))
        got3 = sorted(
            map(tuple, con.execute(
                compile_sql_skip_to(SKIP_PAT, span, 1, "first")
            ).fetchall())
        )
        assert got3 == sorted(expect3)
        # MEASURES over an optional stage (NULL-on-empty under randomness);
        # the two "a" anchors become adjacent when the '?' is empty, so
        # they carry provably-disjoint literal intervals
        OPT_PAT = [("a", "1", "value <= 2.0"), ("p", "?"),
                   ("a", "1", "value > 2.0")]
        OPT_MEMBERS = [lambda r, q: r[2] == "a" and r[3] <= 2.0,
                       lambda r, q: r[2] == "p",
                       lambda r, q: r[2] == "a" and r[3] > 2.0]
        OPT_MEAS = [(1, "sum", "value", "p_c"), (2, "last", "value", "a2_c")]
        expect4 = set()
        for u, rs in by_user.items():
            for m in _model_members_measures(
                rs, OPT_MEMBERS, ["1", "?", "1"], OPT_MEAS, span
            ):
                expect4.add((u, *m))
        got4 = {
            tuple(r)
            for r in con.execute(
                compile_sql(OPT_PAT, span, measures=OPT_MEAS)
            ).fetchall()
        }
        assert got4 == expect4

    sweep()


# --- round 15: cross-symbol DEFINE + RUNNING measures ---------------------


def _valued_synthetic(seed=7, users=3, n=300):
    """Seeded stream with a value column; returns (rows, spark_rows)."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(users):
        t = 0
        for _ in range(n):
            t += rng.randint(1, 3600) * 1000000
            rows.append(
                (u, eid, rng.choice(["p", "v", "c"]), t,
                 round(rng.uniform(1, 50), 2))
            )
            eid += 1
    return rows


def _valued_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, t long, value double",
    ).selectExpr(
        "user_id", "event_id", "event_type", "timestamp_micros(t) AS ts",
        "value",
    )


def _valued_duck(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " make_timestamp(t) AS ts, value FROM (VALUES "
        + ",".join(f"({u},{e},'{et}',{t},{v})" for u, e, et, t, v in rows)
        + ") v(user_id, event_id, event_type, t, value)"
    )
    return con


def test_cep_cross_symbol_define_three_way(spark):
    """`p (v: value > p.value)+` three ways: an independent anchor-walk
    model == Spark == compile_sql on DuckDB.  The model re-derives the
    semantics from the STANDARD's reading (each consumed v must exceed
    the value of the row stage p consumed), not from the anchor-column
    construction -- so agreement checks the compilation trick, not just
    two copies of it."""
    rows = _valued_synthetic()
    span = 6 * 3600 * 1000000
    pat = [("p", "1"), ("v", "+", "value > p.value")]

    by_user = defaultdict(list)
    for u, e, et, t, v in rows:
        by_user[u].append((t, e, et, v))
    for rs in by_user.values():
        rs.sort()
    model = []
    for u, rs in by_user.items():
        n = len(rs)
        for s in range(n):
            if rs[s][2] != "p":
                continue
            anchor = rs[s][3]
            r = 0
            while (
                s + 1 + r < n
                and rs[s + 1 + r][2] == "v"
                and rs[s + 1 + r][3] > anchor
            ):
                r += 1
            if r >= 1 and rs[s + r][0] - rs[s][0] <= span:
                model.append(
                    (u, rs[s][0], rs[s + r][0], rs[s + r][0] - rs[s][0],
                     1 + r, 1, r)
                )
    assert len(model) > 10

    got = sorted(
        tuple(r)
        for r in cep_match(_valued_df(spark, rows), pat, span).collect()
    )
    assert got == sorted(model)

    con = _valued_duck(rows)
    sql_rows = con.execute(compile_sql(pat, span)).fetchall()
    assert sorted(map(tuple, sql_rows)) == sorted(model)


def test_cep_cross_symbol_quantified_target_three_way(spark):
    """Quantified cross-symbol targets (round 15, second wave): `p+ (v:
    value > p.value)+` reads the p-RUN's LAST row -- SQL:2016's running
    last-row semantics.  The model walks the stream independently
    (maximal p-run, anchor = its last row, then the maximal qualifying
    v-run), so agreement proves the anchor-column compilation gives the
    run-last row, not an arbitrary member.  A bounded {1,2} target
    exercises the same path under a run-length filter."""
    rows = _valued_synthetic(seed=23)
    span = 6 * 3600 * 1000000

    by_user = defaultdict(list)
    for u, e, et, t, v in rows:
        by_user[u].append((t, e, et, v))
    for rs in by_user.values():
        rs.sort()

    for p_quant, lo, hi in (("+", 1, None), ("{1,2}", 1, 2)):
        pat = [("p", p_quant), ("v", "+", "value > p.value")]
        model = []
        for u, rs in by_user.items():
            n = len(rs)
            for s in range(n):
                if rs[s][2] != "p" or (s > 0 and rs[s - 1][2] == "p"):
                    continue  # maximal p-run starts only
                k = 0
                while s + k < n and rs[s + k][2] == "p":
                    k += 1
                if k < lo or (hi is not None and k > hi):
                    continue
                anchor = rs[s + k - 1][3]  # the run's LAST row
                r = 0
                while (
                    s + k + r < n
                    and rs[s + k + r][2] == "v"
                    and rs[s + k + r][3] > anchor
                ):
                    r += 1
                end = s + k + r - 1
                if r >= 1 and rs[end][0] - rs[s][0] <= span:
                    model.append(
                        (u, rs[s][0], rs[end][0], rs[end][0] - rs[s][0],
                         k + r, k, r)
                    )
        assert len(model) > 10, p_quant
        got = sorted(
            tuple(r)
            for r in cep_match(_valued_df(spark, rows), pat, span).collect()
        )
        assert got == sorted(model), p_quant
        con = _valued_duck(rows)
        sql_rows = con.execute(compile_sql(pat, span)).fetchall()
        assert sorted(map(tuple, sql_rows)) == sorted(model), p_quant


def test_cep_cross_symbol_null_anchor(spark):
    """Views BEFORE any purchase have a NULL anchor: IS-TRUE collapse
    must exclude them (no occurrence can start at the stream head)."""
    H = 3600 * 1000000
    rows = [
        (1, 0, "v", 1 * H, 99.0),   # head views, no anchor yet
        (1, 1, "v", 2 * H, 99.0),
        (1, 2, "p", 3 * H, 10.0),
        (1, 3, "v", 4 * H, 20.0),   # > 10 -> consumed
        (1, 4, "v", 5 * H, 5.0),    # <= 10 -> stops the run
    ]
    pat = [("p", "1"), ("v", "+", "value > p.value")]
    got = cep_match(_valued_df(spark, rows), pat, 24 * H).collect()
    assert len(got) == 1
    assert got[0]["n_stage1"] == 1 and got[0]["t_first_us"] == 3 * H
    con = _valued_duck(rows)
    sql_rows = con.execute(compile_sql(pat, 24 * H)).fetchall()
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, got))


def test_cep_cross_symbol_validation(spark):
    rows = _valued_synthetic(n=20)
    df = _valued_df(spark, rows)
    span = 6 * 3600 * 1000000
    for bad in [
        [("p", "1"), ("v", "+", "value > x.value")],    # unknown symbol
        [("v", "+", "value > p.value"), ("p", "1")],    # forward reference
        # EMPTY-ABLE targets: an empty match leaves the anchor on a
        # stale pre-occurrence row (the standard says NULL there)
        [("c", "1"), ("p", "*"), ("v", "+", "value > p.value")],
        [("c", "1"), ("p", "?"), ("v", "+", "value > p.value")],
        [("p", "1"), ("p|v", "+", "value > p.value")],  # type in two stages
        [("p|c", "1"), ("v", "+", "value > p.value")],  # multi-type target
        [("p", "1"), ("v", "+", "value > p.value; --")],  # injection
    ]:
        with pytest.raises(ValueError):
            cep_match(df, bad, span)
    # quantified NON-EMPTY-ABLE targets are legal since the round-15
    # extension (running last-row semantics)
    for ok in [
        [("p", "+"), ("v", "+", "value > p.value")],
        [("p", "{1,2}"), ("v", "+", "value > p.value")],
    ]:
        assert cep_match(df, ok, span).columns


def test_cep_running_measures_three_way(spark):
    """RUNNING SUM/MIN/MAX over ALL ROWS output, three ways: Spark ==
    compile_sql_rows on DuckDB == an independent per-(user, match)
    cumulative fold over the emitted rows' source values."""
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_rows,
        compile_sql_rows,
    )

    rows = _valued_synthetic(seed=11)
    span = 6 * 3600 * 1000000
    pat = [("v", "1"), ("c", "+"), ("p", "1")]
    running = [
        ("sum", "value", "run_sum_c"),
        ("min", "value", "run_min_c"),
        ("max", "value", "run_max_c"),
    ]
    got = sorted(
        tuple(r)
        for r in cep_match_rows(
            _valued_df(spark, rows), pat, span, running=running
        ).collect()
    )
    assert len(got) > 20
    con = _valued_duck(rows)
    sql_rows = con.execute(
        compile_sql_rows(pat, span, running=running)
    ).fetchall()
    assert sorted(map(tuple, sql_rows)) == got

    # independent fold: group by (user, match), walk in seq order, and
    # re-derive each running value from the raw event values
    vmap = {(u, e): v for u, e, et, t, v in rows}
    groups = defaultdict(list)
    for r in got:
        groups[(r[0], r[1])].append(r)
    for g in groups.values():
        g.sort(key=lambda r: r[2])
        acc, mn, mx = 0, None, None
        for r in g:
            c = int(vmap[(r[0], r[3])] * 100 + 0.5)
            acc += c
            mn = c if mn is None else min(mn, c)
            mx = c if mx is None else max(mx, c)
            assert (r[7], r[8], r[9]) == (acc, mn, mx)


def test_cep_running_validation(spark):
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_rows,
    )

    rows = _valued_synthetic(n=20)
    df = _valued_df(spark, rows)
    span = 6 * 3600 * 1000000
    pat = [("v", "1"), ("p", "1")]
    for bad in [
        [("avg", "value", "x")],                         # unknown agg
        [("sum", "value; --", "x")],                     # non-identifier col
        [("sum", "value", "x"), ("min", "value", "x")],  # dup alias
        [("sum", "value")],                              # wrong arity
    ]:
        with pytest.raises(ValueError):
            cep_match_rows(df, pat, span, running=bad)


def test_cep_vshape_three_way(spark):
    """The standard's V-shape ticker (STRT DOWN+ UP+ over ONE type with
    PREV predicates) three ways -- the pattern the same-bound
    disjointness arm admits.  Dense single-type stream so falling and
    rising runs are long and adjacent."""
    rng = random.Random(23)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(250):
            t += rng.randint(1, 1800) * 1000000
            rows.append((u, eid, "p", t, float(rng.randint(1, 12))))
            eid += 1
    span = 24 * 3600 * 1000000
    pat = [
        ("p", "1", "NOT (value < PREV(value))"),
        ("p", "+", "value < PREV(value)"),
        ("p", "+", "value > PREV(value)"),
    ]

    by_user = defaultdict(list)
    for u, e, et, t, v in rows:
        by_user[u].append((t, e, et, v))
    for rs in by_user.values():
        rs.sort()
    model = []
    for u, rs in by_user.items():
        n = len(rs)

        def prev_v(i):
            return rs[i - 1][3] if i > 0 else None

        for s in range(n):
            pv = prev_v(s)
            # NOT(value < PREV) with IS-TRUE collapse: head row anchors
            if pv is not None and rs[s][3] < pv:
                continue
            i = s + 1
            down = 0
            while i < n and rs[i][3] < rs[i - 1][3]:
                down += 1
                i += 1
            if down < 1:
                continue
            up = 0
            while i < n and rs[i][3] > rs[i - 1][3]:
                up += 1
                i += 1
            if up < 1:
                continue
            t0, t1 = rs[s][0], rs[s + down + up][0]
            if t1 - t0 <= span:
                model.append((u, t0, t1, t1 - t0, 1 + down + up, 1, down, up))
    assert len(model) > 10

    got = sorted(
        tuple(r)
        for r in cep_match(_valued_df(spark, rows), pat, span).collect()
    )
    assert got == sorted(model)
    con = _valued_duck(rows)
    sql_rows = con.execute(compile_sql(pat, span)).fetchall()
    assert sorted(map(tuple, sql_rows)) == sorted(model)


def test_cep_same_bound_disjointness_prover(spark):
    """`< PREV` vs `> PREV` on one column is provably disjoint (the
    V-shape arm); `<= PREV` vs `>= PREV` shares the equality point and
    must still be rejected, as must different bounds."""
    rows = _valued_synthetic(n=20)
    df = _valued_df(spark, rows)
    span = 6 * 3600 * 1000000
    # admitted: strict same-bound split
    cep_match(
        df,
        [("p", "1", "NOT (value < PREV(value))"),
         ("p", "+", "value < PREV(value)"),
         ("p", "+", "value > PREV(value)")],
        span,
    )
    # admitted: same-bound split on a cross-symbol anchor
    cep_match(
        df,
        [("c", "1"),
         ("p", "+", "value < c.value"),
         ("p", "+", "value > c.value")],
        span,
    )
    for bad in [
        # shares the equality point
        [("p", "1", "NOT (value <= PREV(value))"),
         ("p", "+", "value <= PREV(value)"),
         ("p", "+", "value >= PREV(value)")],
        # different bounds (PREV of different columns)
        [("p", "1", "NOT (value < PREV(value))"),
         ("p", "+", "value < PREV(value)"),
         ("p", "+", "value > PREV(t)")],
    ]:
        with pytest.raises(ValueError):
            cep_match(df, bad, span)


def test_cep_next_define_three_way(spark):
    """NEXT() lookahead three ways on a MIXED-type stream: the model
    reads the next STREAM row (any type), exactly the standard's input
    navigation -- which distinguishes NEXT from a within-run lookahead."""
    rows = _valued_synthetic(seed=31)
    span = 6 * 3600 * 1000000
    pat = [
        ("p", "+", "value < NEXT(value)"),
        ("p", "1", "NOT (value < NEXT(value))"),
    ]

    by_user = defaultdict(list)
    for u, e, et, t, v in rows:
        by_user[u].append((t, e, et, v))
    for rs in by_user.values():
        rs.sort()
    model = []
    for u, rs in by_user.items():
        n = len(rs)

        def next_ok(i):
            # value < NEXT(value), IS-TRUE collapse at the stream end
            return i + 1 < n and rs[i][3] < rs[i + 1][3]

        for s in range(n):
            # maximal run start: previous row must not be in the run set
            if rs[s][2] != "p" or not next_ok(s):
                continue
            if s > 0 and rs[s - 1][2] == "p" and next_ok(s - 1):
                continue
            i = s
            run = 0
            while i < n and rs[i][2] == "p" and next_ok(i):
                run += 1
                i += 1
            if i < n and rs[i][2] == "p" and not next_ok(i):
                t0, t1 = rs[s][0], rs[i][0]
                if t1 - t0 <= span:
                    model.append((u, t0, t1, t1 - t0, run + 1, run, 1))
    assert len(model) > 10

    got = sorted(
        tuple(r)
        for r in cep_match(_valued_df(spark, rows), pat, span).collect()
    )
    assert got == sorted(model)
    con = _valued_duck(rows)
    sql_rows = con.execute(compile_sql(pat, span)).fetchall()
    assert sorted(map(tuple, sql_rows)) == sorted(model)


def test_cep_next_stream_end_collapse(spark):
    """A stream-final purchase has NULL NEXT: the negated peak predicate
    must admit it (NULL comparison -> false -> NOT -> true)."""
    H = 3600 * 1000000
    rows = [
        (1, 0, "p", 1 * H, 1.0),
        (1, 1, "p", 2 * H, 2.0),
        (1, 2, "p", 3 * H, 3.0),  # stream ends here: peak by collapse
    ]
    pat = [
        ("p", "+", "value < NEXT(value)"),
        ("p", "1", "NOT (value < NEXT(value))"),
    ]
    got = cep_match(_valued_df(spark, rows), pat, 24 * H).collect()
    assert len(got) == 1
    assert got[0]["n_stage0"] == 2 and got[0]["t_last_us"] == 3 * H
    con = _valued_duck(rows)
    sql_rows = con.execute(compile_sql(pat, 24 * H)).fetchall()
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, got))


def test_cep_measure_exprs_three_way(spark):
    """Cross-symbol arithmetic in MEASURES (round 16), three ways on a
    seeded synthetic stream: independent model (cents aggregates over
    consumed intervals, then Python integer arithmetic) == Spark's
    output-time projection == compile_sql's outer-select replay.
    Covers: subtraction across symbols (the standard's LAST(UP) -
    FIRST(DOWN) idiom), literals with * and parens, unary minus, and
    NULL propagation when an operand comes from an empty '?' stage."""
    import math

    rng = random.Random(1616)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(400):
            t += rng.randint(1, 1800) * 1000000
            rows.append(
                (u, eid, rng.choice(["a", "b", "p"]), t,
                 round(rng.uniform(0.5, 30.0), 2))
            )
            eid += 1
    span = 8 * 3600 * 1000000
    by_user = defaultdict(list)
    for u, e, et, t, v in rows:
        by_user[u].append((t, e, et, v))
    for rs in by_user.values():
        rs.sort()

    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, t long, value double",
    ).selectExpr("user_id", "event_id", "event_type",
                 "timestamp_micros(t) AS ts", "value")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " make_timestamp(t) AS ts, value FROM (SELECT * FROM (VALUES "
        + ",".join(f"({u},{e},'{et}',{t},{v})" for u, e, et, t, v in rows)
        + ") v(user_id, event_id, event_type, t, value))"
    )

    def cents(v):
        return int(math.floor(v * 100 + 0.5))

    pattern = [("a", "1"), ("b", "?"), ("p", "+")]
    members = [lambda r, p: r[2] == "a", lambda r, p: r[2] == "b",
               lambda r, p: r[2] == "p"]
    measures = [(0, "first", "value", "a_c"), (1, "sum", "value", "b_c"),
                (2, "sum", "value", "p_sum_c"),
                (2, "last", "value", "p_last_c")]
    exprs = [("spread_c", "p_last_c - a_c"),
             ("with_b_c", "b_c + p_sum_c"),
             ("scaled_c", "3 * (p_last_c - a_c) + 7"),
             ("neg_c", "- a_c + p_last_c")]

    def apply_exprs(mvals):
        a_c, b_c, p_sum_c, p_last_c = mvals
        def null_sub(x, y):
            return None if x is None or y is None else x - y
        spread = null_sub(p_last_c, a_c)
        with_b = None if b_c is None or p_sum_c is None else b_c + p_sum_c
        scaled = None if spread is None else 3 * spread + 7
        neg = None if a_c is None or p_last_c is None else -a_c + p_last_c
        return (spread, with_b, scaled, neg)

    # model: occurrences + measures (same walk as the measures test)
    def model(rs):
        n = len(rs)

        def member(i, pos):
            return members[i](rs[pos], rs[pos - 1] if pos > 0 else None)

        def go(pos, si, segs):
            if si == len(members):
                yield pos, segs
                return
            q = pattern[si][1]
            if q in ("?", "*"):
                yield from go(pos, si + 1, segs + [(pos, 0)])
            if pos >= n:
                return
            if q in ("1", "?"):
                if member(si, pos):
                    yield from go(pos + 1, si + 1, segs + [(pos, 1)])
            else:
                r = 0
                while pos + r < n and member(si, pos + r):
                    r += 1
                if r >= 1:
                    yield from go(pos + r, si + 1, segs + [(pos, r)])

        out = set()
        for start in range(n):
            if not member(0, start):
                continue
            for end, segs in go(start, 0, []):
                t0, t1 = rs[start][0], rs[end - 1][0]
                if t1 - t0 > span:
                    continue
                mvals = []
                for idx, agg, _c, _a in measures:
                    s0, cnt = segs[idx]
                    vals = [cents(rs[s0 + j][3]) for j in range(cnt)]
                    if not vals:
                        mvals.append(None)
                    else:
                        mvals.append({
                            "sum": sum(vals), "min": min(vals),
                            "max": max(vals), "first": vals[0],
                            "last": vals[-1],
                        }[agg])
                counts = [c for _, c in segs]
                out.add((t0, t1, t1 - t0, sum(counts), *counts, *mvals,
                         *apply_exprs(mvals)))
        return out

    expect = set()
    for u, rs in by_user.items():
        for m in model(rs):
            expect.add((u, *m))
    assert len(expect) > 5
    # NULL propagation genuinely exercised: some spread non-null with
    # with_b null (empty '?' stage)
    assert any(m[-3] is None and m[-4] is not None for m in expect)

    got = {
        tuple(r)
        for r in cep_match(
            df, pattern, span, measures=measures, measure_exprs=exprs
        ).collect()
    }
    assert got == expect
    sql_rows = con.execute(
        compile_sql(pattern, span, measures=measures, measure_exprs=exprs)
    ).fetchall()
    assert {tuple(r) for r in sql_rows} == expect


def test_cep_measure_exprs_validation(spark):
    from postgresql_datawarehouse_excercise_spark.catalog import normalize_event_ts

    events = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    pat = [("view", "1"), ("purchase", "+")]
    meas = [(0, "first", "value", "v_c"), (1, "sum", "value", "p_c")]
    ok = [("d_c", "p_c - v_c"), ("e_c", "2 * (p_c + 1) - v_c")]
    # sanity: the ok case builds
    cep_match(events, pat, MAX_US, measures=meas, measure_exprs=ok)
    for bad in [
        [("x", "p_c / v_c")],             # division rejected
        [("x", "p_c - q_c")],             # unknown alias
        [("x", "abs(p_c)")],              # function call (unknown ident + parens misuse)
        [("x", "p_c - 1.5")],             # float literal
        [("v_c", "p_c - 1")],             # collides with a measure alias
        [("n_stage1", "p_c")],            # collides with a count column
        [("duration_us", "p_c")],         # collides with a fixed column
        [("x", "p_c -")],                 # truncated
        [("x", "(p_c - v_c")],            # unbalanced parens
        [("x", "")],                      # empty
        [("x", "p_c; DROP TABLE t")],     # illegal tokens
        [("x", "p_c p_c")],               # trailing tokens
        [("a_c", "p_c"), ("b_c", "a_c + 1")],  # expr referencing an expr
        [("a_c", "p_c"), ("a_c", "v_c")],      # duplicate expr alias
    ]:
        with pytest.raises(ValueError):
            cep_match(events, pat, MAX_US, measures=meas, measure_exprs=bad)
    # the SQL twin validates identically
    with pytest.raises(ValueError):
        compile_sql(pat, MAX_US, measures=meas,
                    measure_exprs=[("x", "p_c / v_c")])


def test_cep_running_measure_exprs_three_way(spark):
    """RUNNING expression measures (round 16) -- arithmetic over the
    running aliases evaluated per emitted row (the standard's RUNNING
    SUM(x) - RUNNING MIN(x) drawdown idiom), three ways: Spark ==
    compile_sql_rows on DuckDB == an independent cumulative fold that
    re-derives each expression value from the raw event values."""
    from postgresql_datawarehouse_excercise_spark.operators.cep import (
        cep_match_rows,
        compile_sql_rows,
    )

    rows = _valued_synthetic(seed=16)
    span = 6 * 3600 * 1000000
    pat = [("v", "1"), ("c", "+"), ("p", "1")]
    running = [
        ("sum", "value", "run_sum_c"),
        ("min", "value", "run_min_c"),
        ("max", "value", "run_max_c"),
    ]
    exprs = [
        ("spread_c", "run_max_c - run_min_c"),
        ("drawdown2x_c", "2 * (run_sum_c - run_min_c)"),
    ]
    got = sorted(
        tuple(r)
        for r in cep_match_rows(
            _valued_df(spark, rows), pat, span,
            running=running, measure_exprs=exprs,
        ).collect()
    )
    assert len(got) > 20
    con = _valued_duck(rows)
    sql_rows = con.execute(
        compile_sql_rows(pat, span, running=running, measure_exprs=exprs)
    ).fetchall()
    assert sorted(map(tuple, sql_rows)) == got

    vmap = {(u, e): v for u, e, et, t, v in rows}
    groups = defaultdict(list)
    for r in got:
        groups[(r[0], r[1])].append(r)
    for g in groups.values():
        g.sort(key=lambda r: r[2])
        acc, mn, mx = 0, None, None
        for r in g:
            c = int(vmap[(r[0], r[3])] * 100 + 0.5)
            acc += c
            mn = c if mn is None else min(mn, c)
            mx = c if mx is None else max(mx, c)
            assert (r[10], r[11]) == (mx - mn, 2 * (acc - mn))

    # validation: expression aliases may not shadow the rows-lane fixed
    # columns, and may only reference running aliases
    for bad in [
        [("classifier", "run_sum_c")],
        [("match_no", "run_sum_c")],
        [("x", "run_sum_c / 2")],
        [("x", "nope_c + 1")],
    ]:
        with pytest.raises(ValueError):
            cep_match_rows(
                _valued_df(spark, rows), pat, span,
                running=running, measure_exprs=bad,
            )
