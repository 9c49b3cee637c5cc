"""Byte-pair-encoding tokenizer: sample-trained, corpus-scale encode.

The train side is the classic Sennrich et al. (2016) merge loop over a
word-frequency table — driver-side on a BOUNDED sample, which is how
production tokenizers are actually built (HF tokenizers train on a
stream sample too; the vocabulary converges long before the corpus
ends). The ENCODE side is the distributed part: merges broadcast as a
rank table, applied per Arrow batch with per-batch word memoization —
natural-language word frequency follows Zipf, so the cache hit rate is
high and the per-batch cost is driven by |distinct words|, not tokens.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_freqs(texts, lowercase: bool) -> dict:
    freqs: dict[str, int] = {}
    for t in texts:
        if t is None:
            continue
        if lowercase:
            t = t.lower()
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 200,
              sample_rows: int = 20_000,
              lowercase: bool = True) -> list:
    """Learn ``n_merges`` BPE merges from a bounded sample of the
    corpus. Deterministic end-to-end: the sample is the ``sample_rows``
    lowest-content-hash rows (orderBy(xxhash64(text)) + limit plans as
    TakeOrderedAndProject — per-task top-n, bounded driver merge — so
    the same corpus yields the same sample under ANY partition count or
    arrival order, unlike a bare limit()), and ties on pair frequency
    break lexicographically.

    Returns the ordered merge list [(left, right), ...] — the entire
    model state, JSON-serializable, broadcastable.
    """
    tc = F.col(text_col)
    texts = [r[0] for r in
             df.select(text_col)
               .orderBy(F.xxhash64(tc).asc(), tc.asc())
               .limit(sample_rows).collect()]
    freqs = _word_freqs(texts, lowercase)
    # word -> symbol tuple (characters, with an end-of-word marker so
    # merges cannot cross word boundaries)
    words = {w: tuple(w) + ("</w>",) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
        if not pair_counts:
            break
        # highest count, ties to the lexicographically smallest pair
        top = max(pair_counts.values())
        pair = min(p for p, c in pair_counts.items() if c == top)
        if top < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_words = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == pair[0]
                        and syms[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def _encode_word(w: str, ranks: dict) -> tuple:
    syms = list(w) + ["</w>"]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               merges: Sequence, lowercase: bool = True,
               with_tokens: bool = False) -> DataFrame:
    """Tokenize every document with the trained merges — one Arrow
    batch pass, merges broadcast as a rank dict, per-batch word
    memoization (Zipf makes the distinct-word set small relative to the
    token stream). Output: (id, n_tokens[, tokens])."""
    import pandas as pd
    from pyspark.sql.types import StructType

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(ranks)
    qf = df.select(F.col(id_col)).schema.fields
    ddl = f"{id_col} {qf[0].dataType.simpleString()}, n_tokens int"
    if with_tokens:
        ddl += ", tokens array<string>"
    schema = StructType.fromDDL(ddl)

    def _batches(it):
        rk = bc.value
        cache: dict[str, tuple] = {}
        for pdf in it:
            ids, counts, toks = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    ids.append(i)
                    counts.append(0)
                    toks.append([])
                    continue
                if lowercase:
                    t = t.lower()
                n, doc_toks = 0, []
                for w in t.split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, rk)
                        cache[w] = enc
                    n += len(enc)
                    if with_tokens:
                        doc_toks.extend(enc)
                ids.append(i)
                counts.append(n)
                toks.append(doc_toks)
            out = {id_col: ids, "n_tokens": counts}
            if with_tokens:
                out["tokens"] = toks
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(_batches, schema)
