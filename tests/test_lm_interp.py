"""LM evaluation + interpolation (MITLM EvaluateNgram / InterpolateNgram /
PerplexityOptimizer roles)."""

import numpy as np

from voicebridge_tpu.lm.interp import (interpolate_models,
                                       optimize_interpolation_weights,
                                       perplexity)
from voicebridge_tpu.lm.ngram import estimate_ngram

RNG = np.random.default_rng(9)


def corpus(vocab, n, length=8):
    """Random sentences biased toward the early words of ``vocab``."""
    p = np.arange(len(vocab), 0, -1, dtype=float)
    p /= p.sum()
    return [[vocab[i] for i in RNG.choice(len(vocab), length, p=p)]
            for _ in range(n)]


VOCAB_A = ["red", "green", "blue", "cyan"]
VOCAB_B = ["dog", "cat", "bird", "red"]  # overlapping word "red"


class TestPerplexity:
    def test_matched_lower_than_mismatched(self):
        a, b = corpus(VOCAB_A, 60), corpus(VOCAB_B, 60)
        lm_a = estimate_ngram(a, order=2)
        lm_b = estimate_ngram(b, order=2)
        held_a = corpus(VOCAB_A, 20)
        assert perplexity(lm_a, held_a) < perplexity(lm_b, held_a)


class TestInterpolation:
    def test_em_prefers_matching_model(self):
        a, b = corpus(VOCAB_A, 60), corpus(VOCAB_B, 60)
        lm_a = estimate_ngram(a, order=2)
        lm_b = estimate_ngram(b, order=2)
        lam = optimize_interpolation_weights([lm_a, lm_b], corpus(VOCAB_A, 25))
        assert abs(sum(lam) - 1.0) < 1e-8
        assert lam[0] > 0.7, lam

    def test_interpolated_model_normalizes(self):
        a, b = corpus(VOCAB_A, 40), corpus(VOCAB_B, 40)
        lm_a = estimate_ngram(a, order=2)
        lm_b = estimate_ngram(b, order=2)
        mix = interpolate_models([lm_a, lm_b], [0.6, 0.4])
        vocab = sorted({ng[0] for ng in mix.ngrams[0]} - {"<s>"})
        assert "</s>" in vocab
        # sum_w p(w|h) == 1 for seen histories, unseen-word histories too
        for hist in [(), ("red",), ("dog",), ("<s>",), ("zzz",)]:
            total = sum(10.0 ** mix._score_word(hist, w) for w in vocab)
            assert abs(total - 1.0) < 1e-6, (hist, total)

    def test_listed_ngrams_match_mixture(self):
        a, b = corpus(VOCAB_A, 40), corpus(VOCAB_B, 40)
        lm_a = estimate_ngram(a, order=2)
        lm_b = estimate_ngram(b, order=2)
        lam = [0.3, 0.7]
        mix = interpolate_models([lm_a, lm_b], lam)
        for ng in list(mix.ngrams[1])[:50]:
            want = sum(l * 10.0 ** m._score_word(ng[:-1], ng[-1])
                       for l, m in zip(lam, [lm_a, lm_b]))
            got = 10.0 ** mix.logprob10(ng)
            assert abs(got - want) < 1e-9, ng

    def test_perplexity_improves_on_mixed_domain(self):
        a, b = corpus(VOCAB_A, 60), corpus(VOCAB_B, 60)
        lm_a = estimate_ngram(a, order=2)
        lm_b = estimate_ngram(b, order=2)
        held = corpus(VOCAB_A, 12) + corpus(VOCAB_B, 12)
        lam = optimize_interpolation_weights([lm_a, lm_b], held)
        mix = interpolate_models([lm_a, lm_b], lam)
        assert perplexity(mix, held) < min(perplexity(lm_a, held),
                                           perplexity(lm_b, held))
