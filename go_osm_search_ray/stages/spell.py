"""Spell correction, n-gram LM, autocomplete (reference Q1-Q4, ST4-ST6).

Distributed/stateful split:

- MODEL BUILD is distributed: n-gram count matrices come from
  `text.ngram_counts` (A5, two-phase aggregation); the vocabulary from
  `text.vocab_with_min_freq` (A6); the noisy-channel model from the tiny
  spell-errors corpus (A7, driver-side — it is a few KB).
- QUERY EVAL is an actor pool: `SpellActor` compiles the models once per
  worker (the FST/LM/noisy-model trio the reference loads at server
  boot, searcher.go:37-73) and corrects query batches vectorized-ish
  (queries are short; candidate spaces are bounded).

Reference semantics mirrored exactly:
- n-gram estimate P(next|prev,n) = count(ngram)/count(prev ngram), 0 on
  unseen prefix (ngram_lm.go:215-295)
- stupid backoff, lambda 0.4 (ngram_lm.go:350-368); query log-prob sums
  log P over 4-grams of the (4 starts + 1 end)-padded sequence
  (ngram_lm.go:305-321)
- vocab threshold 2 with <UNK> replacement (ngram_lm.go:56-110,
  COUNT_THRESOLD_NGRAM constant.go:4)
- noisy channel: char unigram/bigram + per-edit-type confusion counts
  from "correct: err1, err2" lines (spell_corrector.go:57-107); edit
  classification incl. transposition-vs-substitution counter test
  (spell_corrector.go:109-193); add-1 smoothed log prob with
  ALPHA_NO_EDIT_PROB=0.9 for exact matches (spell_corrector.go:195-213)
- candidate terms within edit distance 2 of each query term
  (EDIT_DISTANCE constant.go:5; Levenshtein-DFA x FST in the reference,
  banded Levenshtein over the sorted vocab here)
- correction = argmax over the cartesian candidate queries of
  LM log-prob + edit log-prob (spell_corrector.go:323-356)
- autocomplete: last term by prefix match, top kAutoComplete=3
  candidate queries (spell_corrector.go:361-451)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

START_TOKEN = "<s>"
END_TOKEN = "</s>"
UNK_TOKEN = "<unk>"
START_CHAR = "-"
ALPHA_NO_EDIT_PROB = 0.9
EDIT_DISTANCE = 2
K_AUTOCOMPLETE = 3
LAMBDA = 0.4


def levenshtein(a: str, b: str, max_d: int = EDIT_DISTANCE) -> int:
    """Plain Levenshtein with early exit above max_d."""
    if abs(len(a) - len(b)) > max_d:
        return max_d + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            best = min(best, v)
        if best > max_d:
            return max_d + 1
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------
# noisy channel model (A7 / ST6)


def classify_edit(edited: str, original: str):
    """Reference getEdit (spell_corrector.go:109-193), byte-for-byte."""
    if edited == original:
        return None, edited[0], original[0]
    if len(edited) == len(original):
        same_counter = True
        from collections import Counter

        ec, oc = Counter(edited), Counter(original)
        for k, v in ec.items():
            if oc[k] != v:
                same_counter = False
                break
        for c1, c2 in zip(edited, original):
            if c1 != c2:
                return ("transposition" if same_counter else "substitution"), c1, c2
    for i in range(min(len(edited), len(original))):
        e, o = edited[i], original[i]
        if e != o:
            if len(edited) > len(original):
                return "insertion", e, (original[i - 1] if i > 0 else START_CHAR)
            return "deletion", e, (original[i - 1] if i > 0 else START_CHAR)
    if len(edited) > len(original):
        return "insertion", edited[-1], original[-1]
    if len(original) > 1:
        return "deletion", edited[-1], original[-2]
    return "deletion", edited[-1], START_CHAR


class NoisyChannel:
    """Char unigram/bigram + edit confusion counts (ST6)."""

    def __init__(self, spell_error_lines: list[str]):
        self.unigram: dict[str, int] = {}
        self.bigram: dict[tuple[str, str], int] = {}
        self.edits: dict[str, dict[tuple[str, str], int]] = {}
        for line in spell_error_lines:
            if ":" not in line:
                continue
            correct, _, errs = line.partition(":")
            correct = correct.strip()
            for c in correct:
                self.unigram[c] = self.unigram.get(c, 0) + 1
            self.unigram[START_CHAR] = self.unigram.get(START_CHAR, 0) + 1
            for i in range(len(correct) - 1):
                k = (correct[i], correct[i + 1])
                self.bigram[k] = self.bigram.get(k, 0) + 1
            for err in errs.strip().split(","):
                err = err.strip()
                if not err:
                    continue
                edit, c1, c2 = classify_edit(err, correct)
                if edit is None:
                    continue
                d = self.edits.setdefault(edit, {})
                d[(c1, c2)] = d.get((c1, c2), 0) + 1
        self.alphabet = len(self.unigram)

    def edit_log_prob(self, edited: str, original: str) -> float:
        edit, c1, c2 = classify_edit(edited, original)
        if edit is None:
            return math.log(ALPHA_NO_EDIT_PROB)
        num = self.edits.get(edit, {}).get((c1, c2), 0)
        if edit in ("insertion", "substitution"):
            den = self.unigram.get(c1, 0) + self.alphabet
        else:
            den = self.bigram.get((c1, c2), 0) + self.alphabet * self.alphabet
        return math.log(num + 1) - math.log(den)


# ---------------------------------------------------------------------------
# n-gram LM (ST5)


class NGramLM:
    """Stupid-backoff 4-gram LM over token strings.  Counts come from
    the distributed `text.ngram_counts` pipelines (dicts keyed by
    space-joined n-grams)."""

    def __init__(self, counts: dict[int, dict[str, int]], total_words: int):
        self.counts = counts  # n -> {"w1 w2 ...": count}
        self.total = total_words

    @staticmethod
    def build(docs_ds, vocab: set[str], text_col: str = "text"):
        """Distributed count build with <UNK> replacement (A5+A6)."""
        from . import text as text_stage

        def replace_oov(batch: pd.DataFrame) -> pd.DataFrame:
            toks = text_stage.tokenize_series(batch[text_col])
            batch = batch.copy()
            batch[text_col] = toks.map(
                lambda ws: " ".join(w if w in vocab else UNK_TOKEN for w in ws)
            )
            return batch

        replaced = docs_ds.map_batches(replace_oov, batch_format="pandas")
        # NOTE: '<unk>' re-tokenizes to 'unk' after the space re-join —
        # consistent within the counts, which is all the LM needs.
        # All four orders come from ONE scan (ngram_counts_multi).
        counts, total = text_stage.ngram_counts_multi(replaced, 4,
                                                      text_col=text_col)
        return NGramLM(counts, total)

    def estimate(self, next_word: str, prev: tuple[str, ...], n: int) -> float:
        """P(next|prev) for exactly order n (ngram_lm.go:215-295)."""
        if n == 1:
            return self.counts[1].get(next_word, 0) / self.total if self.total else 0.0
        prev_key = " ".join(prev[-(n - 1):])
        den = self.counts[n - 1].get(prev_key, 0)
        if den == 0:
            return 0.0
        num = self.counts[n].get(prev_key + " " + next_word, 0)
        return num / den

    def stupid_backoff(self, next_word: str, prev: tuple[str, ...], n: int = 4) -> float:
        lam = 1.0
        prev = tuple(prev)
        while n > 0:
            p = lam * self.estimate(next_word, prev, n)
            if p != 0:
                return p
            if len(prev) == 1:
                prev = ()
                lam *= LAMBDA
                n -= 1
                continue
            prev = prev[1:]
            lam *= LAMBDA
            n -= 1
        return 0.0

    def query_log_prob(self, tokens: list[str]) -> float:
        """(4 starts + 1 end)-padded sum of log backoff-4-gram probs
        (ngram_lm.go:305-321 + GetQueryNgramProbability n=4)."""
        seq = [START_TOKEN] * 4 + list(tokens) + [END_TOKEN]
        lp = 0.0
        for i in range(4, len(seq)):
            p = self.stupid_backoff(seq[i], tuple(seq[i - 3 : i]), 4)
            lp += math.log(p) if p > 0 else float("-inf")
        return lp


# ---------------------------------------------------------------------------
# the corrector (ST4 + Q1-Q3 query side)


def _deletes(word: str, max_d: int) -> set[str]:
    """All strings reachable by deleting up to max_d chars (SymSpell)."""
    out = {word}
    frontier = {word}
    for _ in range(max_d):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


class SpellCorrector:
    def __init__(self, vocab: list[str], lm: NGramLM, noisy: NoisyChannel,
                 delete_index_threshold: int = 2000):
        self.vocab = sorted(set(vocab))
        self.by_len: dict[int, list[str]] = {}
        for w in self.vocab:
            self.by_len.setdefault(len(w), []).append(w)
        self.vocab_set = set(self.vocab)
        self.lm = lm
        self.noisy = noisy
        # SymSpell-style delete index (the scale path replacing the
        # reference's Levenshtein-DFA x FST, spell_corrector.go:273-302):
        # precompute delete variants of every vocab term; lookup time is
        # O(deletes(query)) regardless of vocab size.  Only built past a
        # vocab-size threshold — the banded scan wins below it.
        self.delete_index: dict[str, list[str]] | None = None
        if len(self.vocab) >= delete_index_threshold:
            self.delete_index = {}
            for w in self.vocab:
                for d in _deletes(w, EDIT_DISTANCE):
                    self.delete_index.setdefault(d, []).append(w)

    def word_candidates(self, word: str, max_d: int = EDIT_DISTANCE) -> list[str]:
        """All vocab terms within edit distance max_d (FST x Lev-DFA in
        the reference).  Sorted (FST iteration order)."""
        if self.delete_index is not None and max_d == EDIT_DISTANCE:
            cands: set[str] = set()
            for d in _deletes(word, max_d):
                cands.update(self.delete_index.get(d, ()))
            return sorted(w for w in cands if levenshtein(word, w, max_d) <= max_d)
        out = []
        for ln in range(max(1, len(word) - max_d), len(word) + max_d + 1):
            for w in self.by_len.get(ln, ()):
                if levenshtein(word, w, max_d) <= max_d:
                    out.append(w)
        return sorted(out)

    def prefix_candidates(self, prefix: str) -> list[str]:
        """Prefix range on the sorted vocab via two bisects —
        O(log |vocab|), the FST-prefix-walk equivalent
        (spell_corrector.go:361-392) — not a linear vocab scan."""
        import bisect

        lo = bisect.bisect_left(self.vocab, prefix)
        hi = bisect.bisect_left(self.vocab, prefix + "\uffff")
        return self.vocab[lo:hi]

    def candidate_queries(self, tokens: list[str], last_is_prefix: bool = False):
        """Cartesian product of per-term candidates
        (spell_corrector.go:305-321).  Yields lists of (typo, corrected)."""
        per_term: list[list[tuple[str, str]]] = []
        for i, t in enumerate(tokens):
            if last_is_prefix and i == len(tokens) - 1:
                cands = self.prefix_candidates(t)
                if not cands:
                    cands = self.word_candidates(t)
                per_term.append([(t, c) for c in cands] or [(t, t)])
            elif t in self.vocab_set:
                per_term.append([(t, t)])
            else:
                cands = self.word_candidates(t)
                per_term.append([(t, c) for c in cands] or [(t, t)])
        queries = [[]]
        for options in per_term:
            queries = [q + [o] for q in queries for o in options]
            if len(queries) > 20000:  # bounded cartesian guard
                queries = queries[:20000]
        return queries

    def _score(self, cand: list[tuple[str, str]]) -> float:
        lp = self.lm.query_log_prob([c for _, c in cand])
        lp += sum(self.noisy.edit_log_prob(t, c) for t, c in cand)
        return lp

    def correct(self, tokens: list[str]) -> list[str]:
        """Argmax candidate query (spell_corrector.go:323-356)."""
        cands = self.candidate_queries(tokens)
        best, best_lp = None, float("-inf")
        for cand in cands:
            lp = self._score(cand)
            if lp > best_lp:
                best, best_lp = cand, lp
        return [c for _, c in (best or [(t, t) for t in tokens])]

    def autocomplete(self, tokens: list[str]) -> list[list[str]]:
        """Top kAutoComplete=3 candidate queries, last term by prefix
        (spell_corrector.go:410-451)."""
        cands = self.candidate_queries(tokens, last_is_prefix=True)
        scored = sorted(
            ((self._score(c), i) for i, c in enumerate(cands)),
            key=lambda p: -p[0],
        )
        return [[w for _, w in cands[i]] for _, i in scored[:K_AUTOCOMPLETE]]


def build_spell_corrector(docs_ds, spell_error_lines: list[str],
                          text_col: str = "text", min_freq: int = 2):
    """End-to-end model build from a documents Dataset (distributed
    counts) + the spell-errors corpus (driver-side, tiny)."""
    from . import text as text_stage

    vocab_df = text_stage.vocab_with_min_freq(docs_ds, min_freq, text_col=text_col)
    if hasattr(vocab_df, "to_pandas"):
        # the combine was distributed; materializing HERE is the
        # in-memory model build (the corrector holds the vocab anyway)
        vocab_df = vocab_df.to_pandas()
    vocab = set(vocab_df["term"])
    lm = NGramLM.build(docs_ds, vocab, text_col=text_col)
    noisy = NoisyChannel(spell_error_lines)
    return SpellCorrector(sorted(vocab), lm, noisy)


class SpellActor:
    """Actor-pool stage: corrects a batch of query strings.

    State (vocab + LM + noisy model) is built once per actor from
    broadcast refs — the Ray equivalent of the reference's server-boot
    model load (searcher.go:37-73)."""

    def __init__(self, corrector_ref):
        import ray

        self.corrector = ray.get(corrector_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from . import text as text_stage

        toks = text_stage.tokenize_series(batch["query"])
        corrected = toks.map(lambda ws: " ".join(self.corrector.correct(list(ws))))
        return pd.DataFrame(
            {
                "query_id": batch["query_id"],
                "query": batch["query"],
                "corrected": corrected,
            }
        )


def correct_queries(queries_ds, corrector: SpellCorrector, concurrency=2):
    import ray

    ref = ray.put(corrector)
    return queries_ds.map_batches(
        SpellActor,
        fn_constructor_kwargs={"corrector_ref": ref},
        batch_format="pandas",
        concurrency=concurrency,
    )
