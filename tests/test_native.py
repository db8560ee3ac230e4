"""Native C++ tokenizer+encoder vs the Python oracle (SURVEY.md C4)."""

import time

import numpy as np
import pytest

from vqa_tpu import native
from vqa_tpu.datasets.processed import encode_question
from vqa_tpu.datasets.tokenizer import tokenize_mcb

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable; python fallback covers this"
)

VOCAB = ["<pad>", "<unk>", "what", "color", "is", "the", "cat", "how", "many",
         "dogs", "are", "there", "a", "in", "picture", "330", "pm", "mans",
         "shirt", "photo", "booth"]
W2W = {w: i for i, w in enumerate(VOCAB)}

CORPUS = [
    "What color is the cat?",
    "Is this a man's shirt?",
    "How many dogs are there?",
    "Is it 3:30 pm?",
    "left/right or UP-down?",
    '"Quoted" question, with (parens) and $signs!',
    "unknownword anotherunknown",
    "",
    "   ",
    "a " * 50,  # truncation
]


@pytest.fixture(scope="module")
def enc():
    return native.NativeEncoder(VOCAB)


@pytest.mark.parametrize("pad", ["right", "left"])
def test_matches_python_oracle(enc, pad):
    ids, lengths = enc.encode_batch(CORPUS, maxlength=8, pad=pad)
    for i, q in enumerate(CORPUS):
        row, length = encode_question(tokenize_mcb(q), W2W, 8, pad)
        np.testing.assert_array_equal(ids[i], row, err_msg=f"q={q!r} pad={pad}")
        assert lengths[i] == length, q


def test_matches_on_fuzz(enc):
    rng = np.random.default_rng(0)
    chars = list("abcdefgh XYZ?!'\"$:@(),.;-/0123456789")
    for _ in range(200):
        q = "".join(rng.choice(chars, size=rng.integers(0, 60)))
        row, length = encode_question(tokenize_mcb(q), W2W, 12, "right")
        ids, lengths = enc.encode_batch([q], maxlength=12, pad="right")
        np.testing.assert_array_equal(ids[0], row, err_msg=repr(q))
        assert lengths[0] == length


def test_throughput_sanity(enc):
    """Not a benchmark assertion — just proves the batch path handles scale."""
    questions = CORPUS * 5000  # 50k questions
    t0 = time.perf_counter()
    ids, lengths = enc.encode_batch(questions, maxlength=26)
    dt = time.perf_counter() - t0
    assert ids.shape == (len(questions), 26)
    assert dt < 5.0  # generous; typical is tens of ms
