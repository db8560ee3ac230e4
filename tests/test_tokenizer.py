"""Golden tests pinning tokenizer behavior (SURVEY.md section 4, C4)."""

import pytest

from vqa_tpu.datasets.tokenizer import get_tokenizer, tokenize_mcb, tokenize_naive


GOLDEN_MCB = [
    ("What color is the cat?", ["what", "color", "is", "the", "cat"]),
    ("Is this a man's shirt?", ["is", "this", "a", "mans", "shirt"]),
    ("How many people are in the photo-booth?", ["how", "many", "people", "are", "in", "the", "photo", "booth"]),
    ("What's on the table, next to the cup?", ["whats", "on", "the", "table", "next", "to", "the", "cup"]),
    ("Left/right or up?", ["left", "right", "or", "up"]),
    ("Is it 3:30 pm?", ["is", "it", "330", "pm"]),
    ('"Quoted" question!', ["quoted", "question"]),
    ("   ", []),
]

GOLDEN_NAIVE = [
    ("What color is the cat?", ["what", "color", "is", "the", "cat"]),
    ("Is this a man's shirt?", ["is", "this", "a", "man", "s", "shirt"]),
    ("3:30 pm?", ["3", "30", "pm"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN_MCB)
def test_mcb_golden(text, expected):
    assert tokenize_mcb(text) == expected


@pytest.mark.parametrize("text,expected", GOLDEN_NAIVE)
def test_naive_golden(text, expected):
    assert tokenize_naive(text) == expected


def test_registry():
    assert get_tokenizer("mcb") is tokenize_mcb
    with pytest.raises(KeyError):
        get_tokenizer("nope")
