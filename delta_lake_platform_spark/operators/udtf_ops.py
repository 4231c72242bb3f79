"""Python UDTFs (Spark 4): table-generating functions for shapes a
scalar UDF can't return. Kept OFF the hot path (see SCALE.md) — this
is the escape hatch for row→many-rows expansions with per-row logic;
the built-in explode/posexplode/transform family stays preferred.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string")
class WordNGrams:
    """(text, n) -> one row per word n-gram with its position."""

    def eval(self, text: str, n: int):  # noqa: D102
        if not text:
            return
        words = text.lower().split()
        for i in range(max(len(words) - n + 1, 0)):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark) -> None:
    spark.udtf.register("word_ngrams", WordNGrams)
