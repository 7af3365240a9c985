"""Python UDTFs — the general table-function path (SURVEY.md §2.6 F2).

Reference parity: MyTableFunction (UserDefinedFunctions/src/main/java/
TableAPI/MyTableFunction.java:8-16) — `eval(String)` splits on space and
collects `Row(word, length)` with declared output `ROW<word STRING, length
INT>`, invoked as `FROM t, LATERAL TABLE(SplitFunction(myField))`
(FlinkIdeaDemo/src/main/java/NCFlinkTableAPITableFunction.java:41-45).

Two tiers, same semantics:
- `split_words_expr` (operators.transforms.split_words) — posexplode+split,
  pure JVM, the hot path.
- `SplitWordsUDTF` here — a real Python UDTF (Spark 4 `@udtf`), the general
  mechanism for table functions whose logic can't be expressed as
  expressions. Arrow-batched; use only when expressions genuinely can't.

Register with `register_python_udtfs(spark)` and call from SQL:
`SELECT t.s, w.word, w.length FROM t, LATERAL split_words_py(t.s) w`.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="word: string, length: int")
class SplitWordsUDTF:
    """MyTableFunction.java semantics: space-split, one row per word with
    its length. Empty fragments are kept out, matching the reference's
    behavior on single spaces."""

    def eval(self, text: str):  # noqa: D102 - contract defined by @udtf
        if text is None:
            return
        for w in text.split(" "):
            if w:
                yield w, len(w)


def register_python_udtfs(spark) -> None:
    """U1/U2 analog for table functions: make them SQL-callable."""
    spark.udtf.register("split_words_py", SplitWordsUDTF)
    spark.udtf.register("event_runs_py", EventRunsUDTF)


@udtf(returnType="user_id: bigint, event_type: string, run_start_ms: bigint, "
                 "run_len: bigint")
class EventRunsUDTF:
    """POLYMORPHIC table-argument UDTF (Spark 4 `TABLE(t) PARTITION BY
    ... ORDER BY ...`): per-user run-length encoding of the event-type
    stream — one row per unbroken run of the same event type, with its
    start time and length. The partition/order clause gives the UDTF the
    per-key ordered-iteration contract Flink table functions get from
    keyed streams: Spark shuffles by the PARTITION BY key and feeds each
    partition's rows to ONE instance in ORDER BY order, so the state
    here (current run) is O(1) and never sees interleaved users.

    Expressions could do this too (gaps-and-islands, see
    `cep.times_consecutive`) — this class exists as the general
    mechanism demo for per-key ordered stateful logic that expressions
    genuinely can't cover, with an oracle proving the islands parity."""

    def __init__(self):
        self._user = None
        self._type = None
        self._start = None
        self._len = 0

    def _flush(self):
        if self._type is not None:
            return (self._user, self._type, self._start, self._len)
        return None

    def eval(self, row):
        u, t = row["user_id"], row["event_type"]
        ms = row["ts_ms"]
        if u != self._user or t != self._type:
            out = self._flush()
            self._user, self._type, self._start, self._len = u, t, ms, 1
            if out is not None:
                yield out
        else:
            self._len += 1

    def terminate(self):
        out = self._flush()
        if out is not None:
            yield out
