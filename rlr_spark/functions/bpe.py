"""Distributed BPE (byte-pair encoding) merge learning + tokenization.

The one tokenizer-side operator a training-data pipeline genuinely
trains *on the corpus*: learn the merge table (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"), then
tokenize with it. The repo's `bpe_ish_token_count` (functions/text.py)
only counts with a fixed regex; this learns real merges.

Scale design — the standard decomposition:

- The corpus is touched ONCE: a groupBy collapses it to the
  (word, freq) vocabulary table. Everything after is O(|vocab|), not
  O(corpus) — at web scale the distinct-word table is millions of
  rows where the corpus is trillions of tokens, and it's the ONLY
  state the merge loop carries.
- Each merge iteration is two jobs over that table: (1) explode
  adjacent symbol pairs, groupBy (a, b) with freq-weighted sum —
  map-side combinable — and collect exactly ONE row (the argmax,
  ties broken lexicographically so the result is partitioning-
  independent); (2) apply the merge with a JVM `regexp_replace`
  (leftmost, non-overlapping — exactly Sennrich's semantics) on the
  space-joined symbol string. No Python UDFs anywhere.
- `localCheckpoint` every few merges caps the lineage the same way
  the CC star loop does (operators/cluster.py).
- Tokenizing new text reuses the distinct-word trick: distinct words
  -> chain the learned merges -> broadcast-join pieces back onto the
  token stream, so the merge chain runs over the vocabulary, never
  the corpus.

Cited reference behavior: Sennrich's learn_bpe.py (public, MIT) —
greedy highest-frequency pair, lexicographic tie-break, `</w>`
end-of-word marker. This implementation is tested against an
independent in-test pure-Python re-derivation of that spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EOW = "</w>"

_REGEX_SPECIALS = set(".^$*+?()[]{}|\\")


def _java_quote(s: str) -> str:
    """Escape a literal for use inside a Java regex pattern."""
    return "".join(("\\" + ch) if ch in _REGEX_SPECIALS else ch for ch in s)


def _java_quote_replacement(s: str) -> str:
    """Escape a literal replacement string ($ and \\ are special)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the single corpus pass."""
    trimmed = F.trim(F.lower(F.col(text_col)))
    return (
        docs.where(F.col(text_col).isNotNull() & (trimmed != ""))
        .select(F.explode(F.split(trimmed, r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Space-joined character symbols with the end-of-word marker fused
    onto the last character (Sennrich's representation)."""
    chars = F.split(word, "")
    n = F.size(chars)
    with_eow = F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(_EOW))),
    )
    return F.array_join(with_eow, " ")


def _adjacent_pairs(syms_col: str) -> F.Column:
    """array<struct<a,b>> of adjacent symbol pairs of a split symbol string."""
    return F.expr(
        f"""
        filter(
          transform(split({syms_col}, ' '),
                    (x, i) -> CASE WHEN i < size(split({syms_col}, ' ')) - 1
                              THEN struct(x AS a,
                                          element_at(split({syms_col}, ' '), i + 2) AS b)
                              END),
          p -> p IS NOT NULL)
        """
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final vocab DF).

    merges: ordered list of (a, b) symbol pairs. vocab: (word, freq,
    symbols) with symbols the space-joined post-merge segmentation.
    Stops early when no pair occurs more than once (nothing left worth
    merging — matches the reference tool's behavior).
    """
    spark = docs.sparkSession
    vocab = word_freqs(docs, text_col).withColumn(
        "syms", _initial_symbols(F.col("word"))
    )
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        best = (
            vocab.select(F.explode(_adjacent_pairs("syms")).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        pattern = f"(?<!\\S){_java_quote(a + ' ' + b)}(?!\\S)"
        vocab = vocab.withColumn(
            "syms",
            F.regexp_replace(
                "syms", pattern, _java_quote_replacement(a + b)
            ),
        )
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges, vocab


def apply_bpe(
    spark: SparkSession,
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Segment every document under a learned merge table.

    Output: (original columns..., pieces: array<string>). The merge
    chain (one regexp_replace per merge) runs over the DISTINCT words
    only; pieces rejoin the token stream via a broadcast join when the
    vocabulary is small, shuffle join otherwise (AQE's call).
    """
    trimmed = F.trim(F.lower(F.col(text_col)))
    with_words = docs.where(
        F.col(text_col).isNotNull() & (trimmed != "")
    ).withColumn("_words", F.split(trimmed, r"\s+"))
    vocab = (
        with_words.select(F.explode("_words").alias("word"))
        .distinct()
        .withColumn("syms", _initial_symbols(F.col("word")))
    )
    out = vocab
    for a, b in merges:
        pattern = f"(?<!\\S){_java_quote(a + ' ' + b)}(?!\\S)"
        out = out.withColumn(
            "syms", F.regexp_replace("syms", pattern, _java_quote_replacement(a + b))
        )
    word_pieces = out.select("word", F.split(F.col("syms"), " ").alias("_pieces"))
    exploded = with_words.select(
        *docs.columns, F.posexplode("_words").alias("_pos", "word")
    )
    joined = exploded.join(word_pieces, "word")
    # reassemble in word order: sort the collected (pos, pieces) structs
    # (array_sort orders by the first struct field) and flatten
    assembled = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_pos"), F.col("_pieces")))),
            lambda s: s["_pieces"],
        )
    )
    return joined.groupBy(*docs.columns).agg(assembled.alias("pieces"))
