"""Byte-pair-encoding tokenizer: sample-trained, corpus-applied.

The operator pair every LLM-data pipeline runs before packing:
  - ``bpe_train``: learn merge rules from a corpus SAMPLE, driver-side.
    This is the standard production shape — BPE training is inherently
    sequential in the merge dimension (each merge changes the pair
    statistics the next merge ranks on), so real tokenizer trainers
    (GPT-2's, SentencePiece, HF tokenizers) run single-node on a sample;
    a distributed trainer would serialize into one tiny global
    pair-count reduction PER MERGE (hundreds of near-empty Spark jobs —
    strictly worse at any scale).
  - ``bpe_tokenize_counts``: APPLY the learned merges to the whole
    corpus distributed — merges broadcast as a closure constant,
    mapInPandas over Arrow batches, one narrow stats row per document.
    This is the 100 TB-shaped half: application is embarrassingly
    parallel and the payload (text) dies inside the operator.

Algorithm (classic GPT-2-style, word-level pre-split): words split to
character sequences + end-of-word marker; repeatedly merge the most
frequent adjacent symbol pair (ties → lexicographically smallest, so
training is fully deterministic); tokenization replays merges in
learned order. Pure Python on purpose — it is the driver-side twin the
pytest differential pins the distributed path against.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_RE = re.compile(r"[a-z0-9']+", re.IGNORECASE)
_EOW = "</w>"


def _words(text: str) -> list[str]:
    return [w.lower() for w in _WORD_RE.findall(text or "")]


def bpe_train(sample_texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from the sample. Deterministic:
    max count, ties to the lexicographically smallest pair."""
    vocab = Counter()
    for t in sample_texts:
        for w in _words(t):
            vocab[tuple(w) + (_EOW,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = {}
        a, b = best
        ab = a + b
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + cnt
        vocab = merged
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word by replaying merges in learned-rank order."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize_text(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    out: list[str] = []
    for w in _words(text):
        out.extend(bpe_encode_word(w, ranks))
    return out


BPE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_words", T.IntegerType(), False),
        T.StructField("n_tokens", T.IntegerType(), False),
        T.StructField("n_unk_chars", T.IntegerType(), False),
        T.StructField("tokens_per_word", T.DoubleType(), False),
    ]
)


def bpe_tokenize_counts(
    documents: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Distributed application: per-document token statistics under the
    learned merges (the fertility numbers a pipeline uses for packing
    budgets and quality cuts). Merges ride into the workers as a
    broadcast closure constant; per-word encodings are memoized per
    batch (Zipf makes the word→tokens map tiny relative to the text)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                n_words = n_tokens = n_unk = 0
                for w in _words(text):
                    toks = cache.get(w)
                    if toks is None:
                        toks = bpe_encode_word(w, ranks)
                        cache[w] = toks
                    n_words += 1
                    n_tokens += len(toks)
                    n_unk += sum(1 for t in toks if len(t) == 1)
                rows.append(
                    (
                        int(did),
                        n_words,
                        n_tokens,
                        n_unk,
                        (n_tokens / n_words) if n_words else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in BPE_STATS_SCHEMA.fields]
            )

    return documents.select("doc_id", "text").mapInPandas(run, BPE_STATS_SCHEMA)


def bpe_corpus_stats(
    documents: DataFrame, n_merges: int = 200, sample_docs: int = 64
) -> DataFrame:
    """End-to-end: train on the first ``sample_docs`` documents (by
    doc_id — deterministic sample), apply to the whole corpus, return
    per-doc stats ordered by doc_id."""
    sample = [
        r.text
        for r in documents.orderBy("doc_id").limit(sample_docs).select("text").collect()
    ]
    merges = bpe_train(sample, n_merges=n_merges)
    return bpe_tokenize_counts(documents, merges).orderBy("doc_id")
