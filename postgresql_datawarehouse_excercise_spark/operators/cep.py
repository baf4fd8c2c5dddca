"""Complex-event-processing pattern compiler (the MATCH_RECOGNIZE /
FlinkCEP shape, batch edition).

``x_events_cep_pattern`` (round 11) hand-compiled ONE pattern --
``view (click)+ purchase`` -- into the gaps-and-islands + bracketing-join
construction.  This module factors that construction into a compiler over a
small pattern language, so new patterns are data, not new query code:

    Pattern = sequence of stages, each (event_type, quantifier)
    quantifier in {"1", "?", "+", "*"}    (exactly-one / optional /
                                           one-or-more / zero-or-more)
    event_type may be an ALTERNATION "a|b|c" (SQL:2016 row-pattern
    alternation, round 13): the stage matches events whose type is ANY
    of the alternatives -- a quantified alternation consumes a maximal
    run of events drawn from the whole set (types may interleave inside
    the run, exactly (a|b)+ regex semantics under contiguity).

Semantics (the ones the round-11 entry pinned, now stated once):

* STRICTLY CONSECUTIVE in the user's seq-numbered stream (row_number over
  (ts, event_id) per user) -- no intervening events, the property that
  separates CEP from x_events_funnel's min-timestamp stages.
* Quantified stages ("+", "*") consume a MAXIMAL run of their type set
  (greedy-possessive).  Because adjacent stages are required to have
  DISJOINT type sets (enforced below), maximal-run consumption is
  exactly regex-greedy: the event after a run cannot extend it, so any
  shorter consumption would put an in-set event where a disjoint-set
  stage must match.
* "?"/"*" stages may match empty; the empty and non-empty arms are
  mutually exclusive at any given start position (the event right after
  the prefix either has the stage's type or not), so occurrences are
  emitted exactly once.
* The FIRST and LAST stages must be non-empty-able ("1" or "+") so every
  occurrence has well-defined first/last events for the time bound:
  t_last - t_first <= max_span_us (exact epoch MICROS in both engines).

Compilation (Spark): one user-partitioned sequence window, one islands
window per quantified type (seq - row_number over the type's subset), a
map-side-combined run aggregate, then a left-fold over stages where each
stage is one (user_id, seq)-keyed equi-join -- optional stages fork a
skip/consume union.  No global sorts, no cross joins; every join key
includes user_id, so at 100 TB the whole match runs inside the
sessionization partitioning.

``compile_sql`` emits the DuckDB twin by expanding the optional stages
into 2^k fixed arms (k = number of "?"/"*" stages; bounded small) and
chaining the same bracketing joins per arm -- the oracle replays the
construction, it does not share code with it.

Reference: the pattern language mirrors SQL:2016 MATCH_RECOGNIZE row
patterns (A (B|C)+ D?) restricted to strict contiguity (AFTER MATCH SKIP
TO NEXT ROW, ALL ROWS PER MATCH collapsed to one summary row per match).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Stage = tuple[str, str]  # (event_type or "a|b" alternation, quantifier)

_QUANTS = ("1", "?", "+", "*")

# Event types are interpolated into the generated oracle SQL as both CTE
# identifiers and quoted literals; restrict them to identifier characters
# so a quote/space/metacharacter cannot produce invalid (or injectable)
# SQL with a confusing downstream failure (ADVICE r12).
_TYPE_RE = re.compile(r"^[A-Za-z0-9_]+$")


def _alts(etype: str) -> tuple[str, ...]:
    """A stage's alternative type set: 'a' -> ('a',), 'a|b' -> ('a','b'),
    sorted for canonical SQL relation naming."""
    return tuple(sorted(etype.split("|")))


def _validate(pattern: list[Stage]) -> None:
    if len(pattern) < 2:
        raise ValueError("pattern needs at least two stages")
    for etype, q in pattern:
        if q not in _QUANTS:
            raise ValueError(f"bad quantifier {q!r} for {etype!r}")
        alts = _alts(etype)
        for a in alts:
            if not _TYPE_RE.match(a):
                raise ValueError(
                    f"bad event type {a!r} in stage {etype!r}: types must "
                    "match ^[A-Za-z0-9_]+$ (they name SQL relations and "
                    "literals in the compiled oracle)"
                )
        if len(set(alts)) != len(alts):
            raise ValueError(f"duplicate alternative in stage {etype!r}")
    if pattern[0][1] not in ("1", "+") or pattern[-1][1] not in ("1", "+"):
        raise ValueError(
            "first and last stages must be '1' or '+' (anchors for the "
            "time bound)"
        )
    # Adjacent stages must have DISJOINT type sets -- including stages
    # that BECOME adjacent when an optional stage between them matches
    # empty -- otherwise maximal-run consumption is not regex-greedy (a
    # run would need to stop where an overlapping-set stage continues).
    for i in range(len(pattern) - 1):
        j = i + 1
        while j < len(pattern):
            shared = set(_alts(pattern[i][0])) & set(_alts(pattern[j][0]))
            if shared:
                raise ValueError(
                    f"stages {i} and {j} share type(s) {sorted(shared)!r} "
                    "and can be adjacent: maximal-run semantics would be "
                    "ambiguous"
                )
            if pattern[j][1] not in ("?", "*"):
                break  # stage j always consumes >=1 event: blocks i from j+1
            j += 1


def cep_match(
    events: DataFrame,
    pattern: list[Stage],
    max_span_us: int,
    with_seq: bool = False,
) -> DataFrame:
    """All strictly-consecutive occurrences of `pattern` per user.

    Input: events(user_id, event_id, event_type, ts).
    Output: one row per occurrence --
      (user_id, t_first_us, t_last_us, duration_us, n_events,
       n_stage0..n_stage{k-1})
    where n_stage{i} is how many events stage i consumed (0 for an empty
    optional stage).  `with_seq=True` appends (start_seq, end_seq), the
    occurrence's consumed position interval in the per-user sequence --
    what the AFTER MATCH SKIP PAST LAST ROW selection
    (cep_match_skip_past) chains on.
    """
    _validate(pattern)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.row_number().over(w).alias("seq"),
    ).localCheckpoint(eager=False)

    def singles(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type").isin(*_alts(etype))).select(
            "user_id", "seq", "t_us"
        )

    w_sub = Window.partitionBy("user_id").orderBy("t_us", "event_id")

    def runs(etype: str) -> DataFrame:
        # gaps-and-islands: within the per-user stream, consecutive events
        # whose type is in the stage's alternative set share (seq -
        # rank-within-subset); ordering by t_us is ordering by ts
        # (unix_micros is monotone, ties broken by event_id)
        sub = ev.filter(F.col("event_type").isin(*_alts(etype))).withColumn(
            "island", F.col("seq") - F.row_number().over(w_sub)
        )
        return sub.groupBy("user_id", "island").agg(
            F.min("seq").alias("s0"),
            F.max("seq").alias("s1"),
            F.min("t_us").alias("rt0"),
            F.max("t_us").alias("rt1"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )

    # Fold state: (user_id, start_seq, t_first_us, t_last_us, next_seq,
    # n_stage0..n_stage{i-1}).  next_seq = first UNCONSUMED position.
    p: DataFrame | None = None
    for i, (etype, quant) in enumerate(pattern):
        ncol = f"n_stage{i}"
        if i == 0:
            if quant == "1":
                p = singles(etype).select(
                    "user_id",
                    F.col("seq").alias("start_seq"),
                    F.col("t_us").alias("t_first_us"),
                    F.col("t_us").alias("t_last_us"),
                    (F.col("seq") + 1).alias("next_seq"),
                    F.lit(1).cast("long").alias(ncol),
                )
            else:  # "+"
                p = runs(etype).select(
                    "user_id",
                    F.col("s0").alias("start_seq"),
                    F.col("rt0").alias("t_first_us"),
                    F.col("rt1").alias("t_last_us"),
                    (F.col("s1") + 1).alias("next_seq"),
                    F.col("n").alias(ncol),
                )
            continue
        assert p is not None
        carried = [c for c in p.columns if c.startswith("n_stage")]
        if quant in ("1", "?"):
            s = singles(etype).select(
                F.col("user_id").alias("m_user"),
                F.col("seq").alias("m_seq"),
                F.col("t_us").alias("m_t"),
            )
            consumed = (
                p.join(
                    s,
                    (F.col("user_id") == F.col("m_user"))
                    & (F.col("next_seq") == F.col("m_seq")),
                )
                .select(
                    "user_id",
                    "start_seq",
                    "t_first_us",
                    F.col("m_t").alias("t_last_us"),
                    (F.col("next_seq") + 1).alias("next_seq"),
                    *carried,
                    F.lit(1).cast("long").alias(ncol),
                )
            )
        else:  # "+" / "*"
            r = runs(etype).select(
                F.col("user_id").alias("m_user"),
                F.col("s0").alias("m_s0"),
                F.col("s1").alias("m_s1"),
                F.col("rt1").alias("m_t1"),
                F.col("n").alias("m_n"),
            )
            consumed = (
                p.join(
                    r,
                    (F.col("user_id") == F.col("m_user"))
                    & (F.col("next_seq") == F.col("m_s0")),
                )
                .select(
                    "user_id",
                    "start_seq",
                    "t_first_us",
                    F.col("m_t1").alias("t_last_us"),
                    (F.col("m_s1") + 1).alias("next_seq"),
                    *carried,
                    F.col("m_n").alias(ncol),
                )
            )
        if quant in ("?", "*"):
            skipped = p.select(
                "user_id",
                "start_seq",
                "t_first_us",
                "t_last_us",
                "next_seq",
                *carried,
                F.lit(0).cast("long").alias(ncol),
            )
            p = skipped.unionByName(consumed)
        else:
            p = consumed

    assert p is not None
    ncols = [f"n_stage{i}" for i in range(len(pattern))]
    total = None
    for c in ncols:
        total = F.col(c) if total is None else total + F.col(c)
    seq_cols = (
        [
            F.col("start_seq").cast("long").alias("start_seq"),
            (F.col("next_seq") - 1).cast("long").alias("end_seq"),
        ]
        if with_seq
        else []
    )
    return (
        p.filter(F.col("t_last_us") - F.col("t_first_us") <= F.lit(max_span_us))
        .select(
            "user_id",
            "t_first_us",
            "t_last_us",
            (F.col("t_last_us") - F.col("t_first_us")).alias("duration_us"),
            total.cast("long").alias("n_events"),
            *ncols,
            *seq_cols,
        )
    )


def cep_match_skip_past(
    events: DataFrame,
    pattern: list[Stage],
    max_span_us: int,
) -> DataFrame:
    """AFTER MATCH SKIP PAST LAST ROW -- the other canonical
    MATCH_RECOGNIZE after-match mode (cep_match is SKIP TO NEXT ROW, all
    occurrences): scan each user's stream in order and, whenever an
    occurrence completes, resume the scan AFTER its last row, so the
    selected occurrences tile the stream without sharing events.
    Equivalent formulation over cep_match's full occurrence set (at most
    ONE occurrence starts at any position -- the compiler's arms are
    mutually exclusive per start): walk occurrences by ascending
    start_seq, keep one iff it starts after the last kept occurrence's
    end_seq -- the greedy leftmost non-overlapping chain.

    The chain is a per-user SEQUENTIAL fold, so it runs as one
    applyInPandas over user_id groups (a documented Arrow lane; state =
    that user's occurrence list, already bounded by the per-user stream)
    -- the same partitioning every other CEP join uses, so at 100 TB the
    selection adds one Arrow pass inside the existing sessionization
    shuffle, never a global order.  Output schema = cep_match's (seq
    bounds dropped)."""
    _validate(pattern)
    m = cep_match(events, pattern, max_span_us, with_seq=True)

    def chain(pdf):
        # today at most one occurrence starts at any position (arm mutual
        # exclusion under the disjoint-adjacent-sets validation), but that
        # is a property of the CURRENT pattern constructs, not the fold --
        # sort on (start_seq, end_seq) so a future construct that breaks
        # uniqueness gets a deterministic shortest-first tie-break here
        # that compile_sql_skip_past's MIN(end_seq) clause mirrors, instead
        # of pandas group order silently diverging from the oracle
        # (ADVICE r13)
        pdf = pdf.sort_values(["start_seq", "end_seq"])
        keep, last_end = [], -1
        for s, e in zip(pdf["start_seq"], pdf["end_seq"]):
            if s > last_end:
                keep.append(True)
                last_end = e
            else:
                keep.append(False)
        return pdf[keep]

    return (
        m.groupBy("user_id")
        .applyInPandas(chain, m.schema)
        .drop("start_seq", "end_seq")
    )


def compile_sql(
    pattern: list[Stage], max_span_us: int, with_seq: bool = False
) -> str:
    """DuckDB replay of `cep_match`: expand every "?"/"*" stage into its
    empty/non-empty arms (2^k fixed arms), chain each arm's bracketing
    joins, UNION ALL.  `with_seq=True` appends (start_seq, end_seq) --
    the replay of cep_match(with_seq=True), which
    compile_sql_skip_past's recursive chain selects over."""
    _validate(pattern)
    opt_idx = [i for i, (_, q) in enumerate(pattern) if q in ("?", "*")]
    if len(opt_idx) > 4:
        raise ValueError("more than 4 optional stages: arm expansion too wide")

    def in_list(alts: tuple[str, ...]) -> str:
        return "(" + ", ".join(f"'{a}'" for a in alts) + ")"

    def run_rel(alts: tuple[str, ...]) -> str:
        # canonical per-type-set relation name; the arity prefix keeps
        # {'a','b'} and the single type 'a_b' from colliding (alternatives
        # are _TYPE_RE-validated, so the name is always a legal identifier)
        return f"runs_{len(alts)}_" + "_".join(alts)

    run_type_sets = sorted(
        {_alts(t) for t, q in pattern if q in ("+", "*")}
    )
    ctes = [
        """ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM events
)"""
    ]
    for alts in run_type_sets:
        ctes.append(
            f"""{run_rel(alts)} AS (
  SELECT user_id, island, MIN(seq) AS s0, MAX(seq) AS s1,
         MIN(t_us) AS rt0, MAX(t_us) AS rt1,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT user_id, seq, t_us,
           seq - row_number() OVER (PARTITION BY user_id
                                    ORDER BY t_us, event_id) AS island
    FROM ev WHERE event_type IN {in_list(alts)}
  ) GROUP BY 1, 2
)"""
        )

    arms: list[str] = []
    for mask in range(1 << len(opt_idx)):
        present = {
            idx: bool(mask & (1 << b)) for b, idx in enumerate(opt_idx)
        }
        # stage i contributes an alias s{i} over ev (single) or runs_<type>
        # (run); empty optional stages contribute nothing and a 0 count
        joins: list[str] = []
        where: list[str] = []
        n_exprs: list[str] = []  # per-stage consumed-count expressions
        first_t = last_t = None
        first_s: str | None = None  # SQL expr: the occurrence's start seq
        anchor: str | None = None
        prev_end: str | None = None  # SQL expr: seq AFTER the consumed prefix
        for i, (etype, quant) in enumerate(pattern):
            is_run = quant in ("+", "*")
            if quant in ("?", "*") and not present[i]:
                n_exprs.append("CAST(0 AS BIGINT)")
                continue
            alias = f"s{i}"
            if is_run:
                rel = run_rel(_alts(etype))
                start, end = f"{alias}.s0", f"{alias}.s1 + 1"
                n_exprs.append(f"{alias}.n")
                t_first, t_last = f"{alias}.rt0", f"{alias}.rt1"
                cond: list[str] = []
            else:
                rel = "ev"
                start, end = f"{alias}.seq", f"{alias}.seq + 1"
                n_exprs.append("CAST(1 AS BIGINT)")
                t_first = t_last = f"{alias}.t_us"
                cond = [f"{alias}.event_type IN {in_list(_alts(etype))}"]
            if prev_end is None:
                joins.append(f"FROM {rel} {alias}")
                where.extend(cond)
                anchor = alias
            else:
                on = [
                    f"{alias}.user_id = {anchor}.user_id",
                    f"{start} = {prev_end}",
                ] + cond
                joins.append(f"JOIN {rel} {alias} ON " + " AND ".join(on))
            if first_t is None:
                first_t = t_first
                first_s = start
            last_t = t_last
            prev_end = end
        named_n = [
            f"{expr} AS n_stage{i}" for i, expr in enumerate(n_exprs)
        ]
        seq_sel = (
            f",\n       CAST({first_s} AS BIGINT) AS start_seq,"
            f"\n       CAST({prev_end} - 1 AS BIGINT) AS end_seq"
            if with_seq
            else ""
        )
        tail = "\n".join(joins)
        if where:
            tail += "\nWHERE " + " AND ".join(where)
        arms.append(
            f"""SELECT {anchor}.user_id,
       {first_t} AS t_first_us, {last_t} AS t_last_us,
       {last_t} - {first_t} AS duration_us,
       CAST({" + ".join(n_exprs)} AS BIGINT) AS n_events,
       {", ".join(named_n)}{seq_sel}
"""
            + tail
        )
    body = "\nUNION ALL\n".join(arms)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM (\n{body}\n)\nWHERE t_last_us - t_first_us <= {max_span_us}"
    )


def cep_match_permute(
    events: DataFrame,
    prefix: list[Stage],
    types: list[str],
    suffix: list[Stage],
    max_span_us: int,
) -> DataFrame:
    """PERMUTE(t1, .., tk) -- SQL:2016's any-order group (FlinkCEP's
    followedBy-in-any-order): the k types must each occur exactly once,
    strictly consecutively, in ANY order, between `prefix` and `suffix`.
    Expands to the union of k! fixed arms (k <= 4, same bound as the
    optional-arm expansion), each arm one cep_match plan tagged with the
    order it matched; arms are mutually exclusive at any start position
    (the event window after a start has ONE type sequence, and distinct
    orderings disagree at their first differing position), so no dedup is
    needed and each occurrence is emitted exactly once with its witness
    order.  Output = cep_match's columns + `perm` (the comma-joined
    matched order)."""
    import itertools
    from functools import reduce

    if not 2 <= len(types) <= 4:
        raise ValueError("PERMUTE takes 2..4 types (k! arm expansion)")
    if len(set(types)) != len(types):
        raise ValueError("PERMUTE types must be distinct")
    arms = []
    for perm in itertools.permutations(types):
        pat = list(prefix) + [(t, "1") for t in perm] + list(suffix)
        arms.append(
            cep_match(events, pat, max_span_us).withColumn(
                "perm", F.lit(",".join(perm))
            )
        )
    return reduce(lambda a, b: a.unionByName(b), arms)


def compile_sql_permute(
    prefix: list[Stage],
    types: list[str],
    suffix: list[Stage],
    max_span_us: int,
) -> str:
    """DuckDB replay of cep_match_permute: UNION ALL of compile_sql over
    every ordering, each tagged with its order literal."""
    import itertools

    arms = []
    for perm in itertools.permutations(types):
        pat = list(prefix) + [(t, "1") for t in perm] + list(suffix)
        tag = ",".join(perm)
        arms.append(
            f"SELECT *, '{tag}' AS perm FROM (\n{compile_sql(pat, max_span_us)}\n)"
        )
    return "\nUNION ALL\n".join(arms)


def compile_sql_skip_past(pattern: list[Stage], max_span_us: int) -> str:
    """DuckDB replay of `cep_match_skip_past`: the full occurrence set
    (compile_sql with seq bounds) chained by a recursive CTE -- per user,
    seed with the earliest-starting occurrence, then repeatedly take the
    earliest occurrence starting after the last kept one's end.  The
    greedy chain is well-defined because at most one occurrence starts at
    any position (arm mutual exclusion), so every MIN(start_seq) below is
    unique -- but the MIN(end_seq) clause makes the selection
    deterministic (shortest occurrence first, the same tie-break
    cep_match_skip_past's sorted fold applies) even if a future pattern
    construct breaks start uniqueness (ADVICE r13)."""
    inner = compile_sql(pattern, max_span_us, with_seq=True)
    ncols = ", ".join(f"n_stage{i}" for i in range(len(pattern)))
    return f"""
WITH RECURSIVE m AS (
{inner}
),
chain AS (
  SELECT m1.* FROM m m1
  WHERE m1.start_seq = (SELECT MIN(m2.start_seq) FROM m m2
                        WHERE m2.user_id = m1.user_id)
    AND m1.end_seq = (SELECT MIN(m2.end_seq) FROM m m2
                      WHERE m2.user_id = m1.user_id
                        AND m2.start_seq = m1.start_seq)
  UNION ALL
  SELECT m.* FROM chain c JOIN m
    ON m.user_id = c.user_id AND m.start_seq > c.end_seq
  WHERE m.start_seq = (SELECT MIN(m3.start_seq) FROM m m3
                       WHERE m3.user_id = c.user_id
                         AND m3.start_seq > c.end_seq)
    AND m.end_seq = (SELECT MIN(m4.end_seq) FROM m m4
                     WHERE m4.user_id = c.user_id
                       AND m4.start_seq = m.start_seq)
)
SELECT user_id, t_first_us, t_last_us, duration_us, n_events, {ncols}
FROM chain
"""
