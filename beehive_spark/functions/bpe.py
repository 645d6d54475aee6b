"""Byte-pair-encoding train + apply (Sennrich et al. 2016; the GPT-2
greedy-merge encoder shape) for the engine's tokenizer surface.

Division of labor mirrors production tokenizer pipelines exactly:

- STATISTICS are distributed: word frequencies come from one map-side-
  combined groupBy over the corpus (`bpe_encode` in queries/llm.py —
  the same vocab-not-corpus trick `bpe_top_merges` uses: the distinct
  word list is orders of magnitude smaller than the corpus).
- TRAINING is driver-side over the top-K frequency-weighted vocab:
  merge selection is inherently sequential (merge i+1's counts depend
  on merge i), and the capped vocab makes it O(K) per merge — a few
  seconds regardless of corpus size, which is why HF/SentencePiece
  train the same way.
- ENCODING is distributed again: the learned merge ranks broadcast to
  an Arrow-batched ``mapInPandas`` stage with an LRU word cache —
  each distinct word is encoded once per batch, not once per
  occurrence.

Reference scope: net-new (the reference has no text surface); the
spark-side statistics reuse the `bpe_top_merges` shape
(queries/curation.py).
"""

from __future__ import annotations

from functools import lru_cache


def train_bpe(
    word_freqs: list[tuple[str, int]], n_merges: int = 100
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from (word, frequency) pairs.

    Classic frequency-weighted pair counting with an inverted
    pair->word index so each merge only re-examines words that contain
    the merged pair.  Deterministic: ties break on (-count, pair).
    Returns merges in rank order (earlier = higher priority).
    """
    # symbol sequences per word, weighted by frequency
    seqs: dict[str, list[str]] = {w: list(w) for w, _ in word_freqs}
    freq = dict(word_freqs)

    def count_pairs(words):
        counts: dict[tuple[str, str], int] = {}
        index: dict[tuple[str, str], set[str]] = {}
        for w in words:
            s, f = seqs[w], freq[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
                index.setdefault((a, b), set()).add(w)
        return counts, index

    counts, index = count_pairs(seqs)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 1:
            break
        merges.append(best)
        touched = list(index.get(best, ()))
        # subtract the touched words' old pair counts, apply the merge,
        # add the new counts back — counts stay exact per merge
        for w in touched:
            s, f = seqs[w], freq[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] -= f
                if counts[(a, b)] <= 0:
                    counts.pop((a, b), None)
                index.get((a, b), set()).discard(w)
            seqs[w] = _apply_merge(s, best)
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
                index.setdefault((a, b), set()).add(w)
    return merges


def _apply_merge(seq: list[str], pair: tuple[str, str]) -> list[str]:
    out, i = [], 0
    a, b = pair
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def make_encoder(merges: list[tuple[str, str]], cache_size: int = 65536):
    """A cached word -> list-of-tokens encoder applying the lowest-rank
    merge first until none applies (the GPT-2 greedy loop)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @lru_cache(maxsize=cache_size)
    def encode(word: str) -> tuple[str, ...]:
        seq = list(word)
        while len(seq) > 1:
            pairs = [(ranks.get((a, b), 1 << 60), (a, b)) for a, b in zip(seq, seq[1:])]
            rank, best = min(pairs)
            if rank >= 1 << 60:
                break
            seq = _apply_merge(seq, best)
        return tuple(seq)

    return encode
