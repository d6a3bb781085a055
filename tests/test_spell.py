"""Spell correction / n-gram LM / autocomplete vs hand-computed values.

Golden LM cases mirror the reference's test style
(pkg/searcher/ngram_lm_test.go): tiny corpus, hand-counted n-grams,
stupid-backoff probabilities with lambda=0.4."""

import math

import numpy as np
import pandas as pd
import pytest

from go_osm_search_ray import synth
from go_osm_search_ray.stages import spell, text


class TestLevenshtein:
    def test_basic(self):
        assert spell.levenshtein("kitten", "sitting", 3) == 3
        assert spell.levenshtein("abc", "abc") == 0
        assert spell.levenshtein("abc", "ab") == 1
        assert spell.levenshtein("abc", "xyzabc", 2) == 3  # capped at max_d+1

    def test_band_exit(self):
        assert spell.levenshtein("a", "aaaaaa", 2) == 3  # > max_d -> max_d+1


class TestClassifyEdit:
    # cases from reference spell_corrector.go:109-193 comments
    def test_cases(self):
        assert spell.classify_edit("abdc", "abcd")[0] == "transposition"
        assert spell.classify_edit("abcf", "abcd")[0] == "substitution"
        assert spell.classify_edit("abfcd", "abcd") == ("insertion", "f", "b")
        assert spell.classify_edit("fabc", "abc") == ("insertion", "f", "-")
        assert spell.classify_edit("abce", "abcde") == ("deletion", "e", "c")
        assert spell.classify_edit("bc", "abc") == ("deletion", "b", "-")
        assert spell.classify_edit("stanfords", "stanford") == ("insertion", "s", "d")
        assert spell.classify_edit("stanfor", "stanford") == ("deletion", "r", "r")
        assert spell.classify_edit("abc", "abc")[0] is None


class TestNoisyChannel:
    def test_counts_and_logprob(self):
        nc = spell.NoisyChannel(["ab: ba, axb", "cd: c"])
        # unigrams: a,b from 'ab'; c,d from 'cd'; START per line (x2)
        assert nc.unigram["-"] == 2
        assert nc.unigram["a"] == 1 and nc.unigram["c"] == 1
        assert nc.bigram[("a", "b")] == 1
        # exact match -> log(0.9)
        assert nc.edit_log_prob("ab", "ab") == math.log(0.9)
        # unseen substitution gets add-1 smoothing
        p = nc.edit_log_prob("az", "ab")  # substitution z->b... classify
        assert p < 0


class TestNGramLM:
    def corpus(self):
        # two docs, hand-countable
        return pd.DataFrame(
            {"doc_id": [0, 1], "text": ["jalan kebun raya", "jalan kebun indah"]}
        )

    @pytest.mark.usefixtures("ray_session")
    def test_counts_and_backoff(self):
        import ray.data as rd

        docs = rd.from_pandas(self.corpus())
        vocab = {"jalan", "kebun", "raya", "indah"}
        lm = spell.NGramLM.build(docs, vocab)
        # unigram counts: each doc pads 1 <s> and 1 </s>
        assert lm.counts[1]["jalan"] == 2
        assert lm.counts[1][spell.START_TOKEN] == 2
        # P(kebun | jalan) bigram = count("jalan kebun")/count("jalan") = 2/2
        assert lm.estimate("kebun", ("jalan",), 2) == 1.0
        # P(raya | kebun) = 1/2
        assert lm.estimate("raya", ("kebun",), 2) == 0.5
        # backoff: unseen 4-gram prefix falls through to lower orders
        p = lm.stupid_backoff("kebun", ("zzz", "zzz", "jalan"), 4)
        assert p > 0

    @pytest.mark.usefixtures("ray_session")
    def test_query_log_prob_orders_queries(self):
        import ray.data as rd

        docs = rd.from_pandas(self.corpus())
        vocab = {"jalan", "kebun", "raya", "indah"}
        lm = spell.NGramLM.build(docs, vocab)
        good = lm.query_log_prob(["jalan", "kebun", "raya"])
        bad = lm.query_log_prob(["raya", "jalan", "kebun"])
        assert good > bad


@pytest.mark.usefixtures("ray_session")
class TestCorrector:
    def build(self):
        import ray.data as rd

        rng = np.random.default_rng(0)
        words = ["jalan", "kebun", "binatang", "ragunan", "taman", "indah"]
        docs = pd.DataFrame(
            {
                "doc_id": range(40),
                "text": [
                    " ".join(rng.choice(words, 3))
                    for _ in range(40)
                ],
            }
        )
        ds = rd.from_pandas(docs)
        return spell.build_spell_corrector(
            ds, synth.spell_errors_lines(words), min_freq=1
        )

    def test_corrects_typos(self):
        sc = self.build()
        # mirrors the reference E2E style: misspelled query -> corrected
        # ("Kebun Bibatqng Raginan" -> "Kebun Binatang Ragunan",
        #  searcher_test.go:87-93)
        got = sc.correct(["kebun", "bibatang", "ragonan"])
        assert got == ["kebun", "binatang", "ragunan"]

    def test_in_vocab_words_kept(self):
        sc = self.build()
        assert sc.correct(["jalan", "kebun"]) == ["jalan", "kebun"]

    def test_autocomplete_prefix(self):
        sc = self.build()
        outs = sc.autocomplete(["jalan", "bin"])
        assert len(outs) <= 3 and len(outs) >= 1
        assert any(q[-1] == "binatang" for q in outs)

    def test_correct_queries_pipeline(self):
        import ray.data as rd

        sc = self.build()
        qs = pd.DataFrame(
            {
                "query_id": [0, 1],
                "query": ["kebun bibatang", "jalan tamon indah"],
            }
        )
        out = (
            spell.correct_queries(rd.from_pandas(qs), sc, concurrency=1)
            .to_pandas()
            .sort_values("query_id")
        )
        assert out["corrected"].tolist() == [
            "kebun binatang",
            "jalan taman indah",
        ]
