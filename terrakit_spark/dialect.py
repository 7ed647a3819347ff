"""Two-dialect SQL rendering: Spark SQL and DuckDB.

Every deterministic synthetic derivation (and every SQL-expressible
operator) is written ONCE as a template using the ``D(dialect)`` helpers
below, then rendered for Spark (the engine) and DuckDB (the correctness
oracle). Keeping one source of truth for both engines is what makes the
value-hash comparison in CORRECTNESS_r{N}.json meaningful: any divergence
is an engine bug, not a transcription bug.

Only integer-exact or bit-identical IEEE-double arithmetic is used in the
templates (same expression tree on both sides), so results match exactly.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


class D:
    """Dialect-specific SQL snippets."""

    def __init__(self, dialect: str):
        assert dialect in (SPARK, DUCK)
        self.d = dialect

    # identifier quoting (``offset`` is reserved in DuckDB)
    def q(self, name: str) -> str:
        return f"`{name}`" if self.d == SPARK else f'"{name}"'

    # integer floor-division of non-negative ints
    def idiv(self, a: str, b: str) -> str:
        return f"({a} div {b})" if self.d == SPARK else f"({a} // {b})"

    # date +/- integer days
    def date_add(self, date_expr: str, days_expr: str) -> str:
        if self.d == SPARK:
            return f"date_add({date_expr}, CAST({days_expr} AS INT))"
        return f"({date_expr} + CAST({days_expr} AS INT))"

    def date_diff_days(self, end: str, start: str) -> str:
        if self.d == SPARK:
            return f"datediff({end}, {start})"
        return f"datediff('day', {start}, {end})"

    # 'YYYY-MM-DD' string -> date
    def to_date(self, s: str) -> str:
        return f"to_date({s})" if self.d == SPARK else f"CAST({s} AS DATE)"

    # date -> 'YYYY-MM-DD' string
    def date_str(self, date_expr: str) -> str:
        if self.d == SPARK:
            return f"date_format({date_expr}, 'yyyy-MM-dd')"
        return f"strftime({date_expr}, '%Y-%m-%d')"

    # date -> 'YYYYMMDD' compact token
    def date_token(self, date_expr: str) -> str:
        if self.d == SPARK:
            return f"date_format({date_expr}, 'yyyyMMdd')"
        return f"strftime({date_expr}, '%Y%m%d')"

    def parse_date_token(self, s: str) -> str:
        """'YYYYMMDD' string -> date."""
        if self.d == SPARK:
            return f"to_date({s}, 'yyyyMMdd')"
        return f"strptime({s}, '%Y%m%d')::DATE"

    # date -> 'YYYYDDD' (year + zero-padded day-of-year) compact token
    def date_token7(self, date_expr: str) -> str:
        if self.d == SPARK:
            return f"date_format({date_expr}, 'yyyyDDD')"
        return f"strftime({date_expr}, '%Y%j')"

    # date -> 'YYMMDD' compact token
    def date_token6(self, date_expr: str) -> str:
        if self.d == SPARK:
            return f"date_format({date_expr}, 'yyMMdd')"
        return f"strftime({date_expr}, '%y%m%d')"

    def try_parse_8(self, s: str) -> str:
        """'YYYYMMDD' -> date, NULL when not a real calendar date."""
        if self.d == SPARK:
            return f"to_date(try_to_timestamp({s}, 'yyyyMMdd'))"
        return f"CAST(try_strptime({s}, '%Y%m%d') AS DATE)"

    def try_parse_7(self, s: str) -> str:
        """'YYYYDDD' (day-of-year) -> date, NULL when invalid.

        Manual make_date + day offset in BOTH dialects: DuckDB's strptime
        silently ignores %j (returns Jan 1), and the arithmetic form also
        rejects day 366 in non-leap years via the same-year check.
        """
        y = f"CAST(substring({s}, 1, 4) AS INT)"
        ddd = f"CAST(substring({s}, 5, 3) AS INT)"
        dt = self.date_add(f"make_date({y}, 1, 1)", f"{ddd} - 1")
        return f"(CASE WHEN {ddd} >= 1 AND year({dt}) = {y} THEN {dt} END)"

    def regexp_extract_all_expr(self, s: str, pattern: str) -> str:
        if self.d == SPARK:
            return f"regexp_extract_all({s}, '{pattern}', 0)"
        return f"regexp_extract_all({s}, '{pattern}')"

    # printf-style formatting
    def fmt(self, fmt: str, *args: str) -> str:
        fn = "format_string" if self.d == SPARK else "printf"
        return f"{fn}('{fmt}', {', '.join(args)})"

    def split_ws(self, s: str) -> str:
        return f"split({s}, ' ')" if self.d == SPARK else f"string_split({s}, ' ')"

    def arr_len(self, a: str) -> str:
        return f"size({a})" if self.d == SPARK else f"len({a})"

    def list_filter_in(self, arr: str, values: list[str]) -> str:
        """count of array elements in a literal set"""
        lits = ", ".join(f"'{v}'" for v in values)
        if self.d == SPARK:
            return f"size(filter({arr}, x -> x IN ({lits})))"
        return f"len(list_filter({arr}, x -> x IN ({lits})))"

    def regexp_replace_all(self, s: str, pattern: str, repl: str) -> str:
        """Replace EVERY match (Spark replaces all by default; DuckDB needs
        the 'g' flag)."""
        if self.d == SPARK:
            return f"regexp_replace({s}, '{pattern}', '{repl}')"
        return f"regexp_replace({s}, '{pattern}', '{repl}', 'g')"

    def regexp_count(self, s: str, pattern: str) -> str:
        if self.d == SPARK:
            return f"size(regexp_extract_all({s}, '{pattern}', 0))"
        return f"len(regexp_extract_all({s}, '{pattern}', 0))"

    def rolling_hash(self, s: str, mod: int = 1000000007) -> str:
        """Polynomial rolling hash over the characters of a string —
        pure 64-bit integer arithmetic, identical in both engines.
        acc := (acc*31 + codepoint(c)) % mod.
        """
        if self.d == SPARK:
            return (
                f"aggregate(split({s}, ''), CAST(0 AS BIGINT), "
                f"(acc, c) -> (acc * 31 + CAST(ascii(c) AS BIGINT)) % {mod})"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {mod})"
        )

    def shiftright(self, a: str, b: str) -> str:
        return f"shiftright({a}, CAST({b} AS INT))" if self.d == SPARK else f"({a} >> {b})"

    def shiftleft(self, a: str, b: str) -> str:
        return f"shiftleft({a}, CAST({b} AS INT))" if self.d == SPARK else f"({a} << {b})"

    def bitxor(self, a: str, b: str) -> str:
        return f"({a} ^ {b})" if self.d == SPARK else f"xor({a}, {b})"

    def arr_distinct_len(self, a: str) -> str:
        return f"size(array_distinct({a}))" if self.d == SPARK else f"len(list_distinct({a}))"

    # table-generating: explode an integer sequence [start..stop] step,
    # produced as "<from_clause>" fragment with alias col
    def explode_seq(self, start: str, stop: str, step: str, alias: str) -> str:
        """Fragment usable after a FROM <tbl>: lateral sequence explode."""
        if self.d == SPARK:
            return (
                f"LATERAL VIEW explode(sequence(CAST({start} AS BIGINT), "
                f"CAST({stop} AS BIGINT), CAST({step} AS BIGINT))) _t_{alias} AS {alias}"
            )
        # DuckDB 1.0 cannot lateral-join generate_series on a column; the
        # parallel-unnest-zip form must be placed in SELECT instead. Callers
        # that need DuckDB lateral sequences use select_unnest_seq().
        raise NotImplementedError("use select_unnest_seq for duck")

    def select_unnest_seq(self, start: str, stop: str, step: str) -> str:
        """Expression usable in SELECT (DuckDB zips parallel unnests)."""
        assert self.d == DUCK
        return f"unnest(generate_series({start}, {stop}, {step}))"
