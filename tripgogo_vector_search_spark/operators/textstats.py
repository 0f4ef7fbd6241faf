"""Text-analysis operators over the documents table: per-doc stats,
language-ID heuristic, quality scoring, fingerprinting, language
distribution. All single-scan Catalyst expressions; the only shuffle is
the distribution groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import (STOPWORDS, fingerprint, lang_scores, quality_score,
                              token_count, word_count)
from ..partitioning import widen


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """char / word / lexer-token counts + mean word length."""
    wc = word_count(text_col)
    return widen(df).select(
        F.col(id_col),
        F.length(text_col).alias("char_count"),
        wc.alias("word_count"),
        token_count(text_col).alias("token_count"),
        F.round(F.length(text_col).cast("double") / wc, 6).alias("chars_per_word"),
    )


def lang_pred_expr(text_col: str = "text") -> F.Column:
    """Stopword-hit language ID as a Column. Deterministic argmax:
    alphabetical language order wins ties; zero hits everywhere ->
    'unknown'."""
    scores = lang_scores(text_col)
    ordered = sorted(scores)  # first-match-wins CASE ladder => alphabetical tie priority
    pred = None
    for lang in ordered:
        others = [scores[o] for o in ordered if o != lang]
        cond = (scores[lang] > 0) & (scores[lang] >= F.greatest(*others))
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred.otherwise(F.lit("unknown"))


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return widen(df).select(F.col(id_col),
                            lang_pred_expr(text_col).alias("lang_pred"))


def doc_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), quality_score(text_col).alias("quality"))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), fingerprint(text_col).alias("fp"))


def lang_distribution(df: DataFrame, lang_col: str = "lang") -> DataFrame:
    return df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n_docs"))
