"""Learned-subword tokenization (WordPiece-style greedy longest-match,
Wu et al. 2016 arXiv:1609.08144 §4.1) — the genuine tokenizer beside
the regex token counters (token_count_histogram): a bounded subword
vocabulary is LEARNED from a curated corpus slice by frequency, and
every document is tokenized by greedy longest-prefix match against it.

Engine-exactness contract: the vocabulary derivation is pure
aggregation (count DESC, gram ASC tie-break — deterministic), and the
greedy match consumes >=1 character per step with a fixed length
preference (4 > 3 > 2 > single char), so the token count per word is a
deterministic pure function of (word, vocab) that a DuckDB recursive
CTE replays exactly (registry oracle) and plain Python replays a third
time (tests/test_round12_props.py).

Scale: the vocab is a BOUNDED frame (top-K grams) collected once on the
driver — the ivfpq probe-selection contract — and tokenization is a
map-only Arrow pass with the vocab broadcast in the UDF closure;
payload text never shuffles. Tokenizers are the canonical case where a
Pandas UDF is the right tool: per-character greedy matching has no
vectorized Catalyst form, and real pipelines (HF tokenizers on Spark)
run exactly this shape.

Reference parity: token budgeting ahead of ingest_hotels.py-style
embedding ingest (the reference's MiniLM pipeline tokenizes with
WordPiece; this is that stage's engine-native stand-in).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: learned-gram lengths, longest preferred at match time
GRAM_LENS = (2, 3, 4)
VOCAB_K = 200


def subword_vocab(docs: DataFrame, curated, text_col: str = "text",
                  k: int = VOCAB_K) -> DataFrame:
    """Top-``k`` character 2-4-grams of the curated slice's lowercased
    space-split words, by (count DESC, gram ASC) — a deterministic,
    bounded vocabulary frame. Counts carry word multiplicity (the
    Sennrich/WordPiece convention: frequent words dominate the
    vocabulary)."""
    w = (docs.filter(curated)
         .select(F.explode(F.split(F.lower(F.col(text_col)), " "))
                 .alias("w"))
         .filter(F.col("w") != ""))
    # guard short words: sequence(1, 0) counts DOWN in Spark (the
    # synth_bmp h=0 trap), so a word shorter than L must contribute
    # an empty gram list, not [substr(w,1,L), substr(w,0,L)] junk.
    # NOTE the closure factory: a `lambda i, L=L:` default arg makes
    # the HOF lambda BINARY, and pyspark then passes the ARRAY INDEX
    # as the second argument — substr(w, i, index), silently junk.
    def _grams_of_len(L: int):
        return F.when(F.length("w") >= L, F.transform(
            F.sequence(F.lit(1), F.length("w") - L + 1),
            lambda i: F.substring(F.col("w"), i.cast("int"), L))) \
            .otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))

    grams = w.select(F.explode(F.flatten(F.array(
        *[_grams_of_len(L) for L in GRAM_LENS]))).alias("gram"))
    return (grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("gram").asc())
            .limit(k)
            .select("gram"))


def tokenize_word(word: str, vocab: set[str]) -> int:
    """Greedy longest-match token count for one word — the executable
    spec the Arrow kernel and both oracles agree on: at each position
    try the longest learned gram (4, then 3, then 2); if none matches,
    consume one character (single characters are implicit vocabulary,
    so tokenization is total and always progresses)."""
    pos, n, ln = 0, 0, len(word)
    while pos < ln:
        step = 1
        for L in (4, 3, 2):
            if pos + L <= ln and word[pos:pos + L] in vocab:
                step = L
                break
        pos += step
        n += 1
    return n


def subword_tokenize(docs: DataFrame, vocab_grams: list[str],
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document subword statistics under the learned vocabulary:
    ``(doc_id, n_words, n_tokens, fertility)`` where fertility =
    tokens/word (the compression metric tokenizer quality is judged
    by). Map-only Arrow pass; NULL text yields NULL stats.

    Case is normalized exactly ONCE, engine-side (ADVICE r12): the
    kernel receives ``F.lower(text)`` — the same Catalyst expression
    :func:`subword_vocab` learns from — and never calls Python's
    ``str.lower()``, so the engine path has a single case-mapping
    implementation and the kernel is a deterministic pure function of
    (pre-lowered word, vocab) even for non-ASCII codepoints whose
    Python/JVM case foldings disagree (e.g. U+0130). Cross-ENGINE
    oracle parity still compares Spark ``lower`` to DuckDB ``lower``;
    those agree on ASCII (the fixture corpus) — the documented oracle
    assumption, pinned with a non-ASCII kernel-purity test in
    tests/test_round13_props.py."""
    vocab = frozenset(vocab_grams)

    @F.pandas_udf("struct<n_words:bigint,n_tokens:bigint>")
    def _tok(texts: pd.Series) -> pd.DataFrame:
        nw, nt = [], []
        memo: dict[str, int] = {}
        for t in texts:
            if t is None:
                nw.append(None)
                nt.append(None)
                continue
            # no .lower() here: input is pre-lowered by Catalyst
            words = [w for w in t.split(" ") if w != ""]
            total = 0
            for w in words:
                c = memo.get(w)
                if c is None:
                    c = tokenize_word(w, vocab)
                    memo[w] = c
                total += c
            nw.append(len(words))
            nt.append(total)
        return pd.DataFrame({"n_words": nw, "n_tokens": nt})

    out = docs.select(F.col(id_col).alias("doc_id"),
                      _tok(F.lower(F.col(text_col))).alias("s"))
    return out.select(
        "doc_id", F.col("s.n_words").alias("n_words"),
        F.col("s.n_tokens").alias("n_tokens"),
        F.when(F.col("s.n_words") > 0,
               F.round(F.col("s.n_tokens")
                       / F.col("s.n_words"), 6)).alias("fertility"))
