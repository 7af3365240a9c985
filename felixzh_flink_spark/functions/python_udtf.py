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
