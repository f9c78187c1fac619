"""Stopword sets.

The reference's ``stop`` token filter defaults to Lucene's classic 33-word
English list (``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET``), per
/root/reference/server/src/main/java/org/opensearch/index/analysis/StopTokenFilterFactory.java:59-76.
The list itself is long-public Lucene knowledge.
"""

ENGLISH_STOP_WORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    }
)

# Named stopword lists registry (ref: server/index/analysis/Analysis.java:119-157
# registers _english_, _none_, etc.).
NAMED_STOP_SETS = {
    "_english_": ENGLISH_STOP_WORDS,
    "_none_": frozenset(),
}
