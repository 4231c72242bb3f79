"""Document-classifier queries (operators/classify.py) with a DuckDB
oracle that replays the full Naive Bayes fit + sparse-scoring identity
(see classify.py's module doc) value-for-value: same tokenizer as the
DSIR/perplexity oracles, same 6-dp score rounding before the argmax,
same label-ascending tie-break."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import classify
from ..sources.catalog import load_table
from .registry import register

NB_CONFUSION_ORACLE = """
WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
test AS (SELECT * FROM documents WHERE doc_id % 2 <> 0),
ttok AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> '')) AS tok
  FROM train
),
counts AS (
  SELECT tok, lang, COUNT(*)::DOUBLE AS cnt FROM ttok GROUP BY tok, lang
),
vsize AS (SELECT COUNT(DISTINCT tok)::DOUBLE AS v FROM counts),
ctok AS (SELECT lang, SUM(cnt) AS tot FROM counts GROUP BY lang),
cdocs AS (SELECT lang, COUNT(*)::DOUBLE AS ndocs FROM train GROUP BY lang),
ntr AS (SELECT COUNT(*)::DOUBLE AS n FROM train),
classes AS (
  SELECT cd.lang AS label,
         ln(cd.ndocs / ntr.n) AS log_prior,
         ln(1.0 / (COALESCE(ct.tot, 0) + v.v)) AS default_lp
  FROM cdocs cd
  LEFT JOIN ctok ct ON cd.lang = ct.lang
  CROSS JOIN ntr CROSS JOIN vsize v
),
deltas AS (SELECT tok, lang AS label, ln(cnt + 1.0) AS delta FROM counts),
stok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> '')) AS tok
  FROM test
),
ntok AS (SELECT doc_id, COUNT(*)::BIGINT AS n_tokens FROM stok GROUP BY doc_id),
hits AS (
  SELECT s.doc_id, d.label, SUM(d.delta) AS dsum
  FROM stok s JOIN deltas d ON s.tok = d.tok
  GROUP BY s.doc_id, d.label
),
base AS (
  SELECT t.doc_id, COALESCE(nt.n_tokens, 0) AS n_tokens,
         c.label, c.log_prior, c.default_lp
  FROM test t LEFT JOIN ntok nt ON t.doc_id = nt.doc_id
  CROSS JOIN classes c
),
sc AS (
  SELECT b.doc_id, b.label,
         ROUND(b.log_prior + b.n_tokens * b.default_lp
               + COALESCE(h.dsum, 0.0), 6) AS score
  FROM base b
  LEFT JOIN hits h ON b.doc_id = h.doc_id AND b.label = h.label
),
pred AS (
  SELECT doc_id, label AS predicted,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, label) AS rn
  FROM sc
)
SELECT t.lang AS true_lang, p.predicted, COUNT(*)::BIGINT AS n_docs
FROM pred p JOIN test t ON p.doc_id = t.doc_id
WHERE p.rn = 1
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("docs_nb_lang_confusion", NB_CONFUSION_ORACLE)
def docs_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit Naive Bayes on the even-id half of the corpus (label =
    ``lang``), predict the odd-id half, and report the confusion
    matrix — the standard classifier-gate calibration readout."""
    docs = load_table(spark, sf_dir, "documents")
    pred = classify.nb_classify(docs, "lang", F.col("doc_id") % 2 == 0)
    return (
        pred.join(
            docs.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
        )
        .groupBy("true_lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("true_lang", "predicted")
    )
