"""Test/benchmark corpus utilities (the reference ships its example corpora
in a separate data repository; this package synthesizes equivalents offline)."""

from .synthesis import Speaker, synth_utterance  # noqa: F401
from .corpus import LEXICON, make_corpus, sample_sentence  # noqa: F401
