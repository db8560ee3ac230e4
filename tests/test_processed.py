"""Vocab building + question/answer encoding semantics (SURVEY.md C4)."""

import numpy as np

from vqa_tpu.config import VQAOptions
from vqa_tpu.datasets.processed import (
    PAD_ID,
    UNK_ID,
    Vocabs,
    build_answer_vocab,
    build_word_vocab,
    encode_question,
    encode_split,
)


def _examples():
    return [
        {"question_id": 1, "image_name": "img_a", "question": "What color is the cat?",
         "answer": "red", "answers": ["red"] * 8 + ["blue", "zebra"]},
        {"question_id": 2, "image_name": "img_b", "question": "What color is the dog?",
         "answer": "blue", "answers": ["blue"] * 10},
        {"question_id": 3, "image_name": "img_c", "question": "Is the cat red?",
         "answer": "yes", "answers": ["yes"] * 9 + ["no"]},
        {"question_id": 4, "image_name": "img_d", "question": "Is the dog blue?",
         "answer": "rare-answer", "answers": ["rare-answer"] * 10},
    ]


def test_answer_vocab_topn_deterministic():
    # counts: red/blue/yes/rare-answer all 1 -> lexicographic tiebreak
    vocab = build_answer_vocab(_examples(), nans=3)
    assert vocab == ["blue", "rare-answer", "red"]


def test_word_vocab_mincount_and_specials():
    vocab = build_word_vocab(_examples(), nlp="mcb", minwcount=1)
    assert vocab[0] == "<pad>" and vocab[1] == "<unk>"
    # words with count > 1 only: the(4), is(4), cat(2), dog(2), color(2), what(2), red...
    assert "the" in vocab and "cat" in vocab
    assert "picture" not in vocab


def test_encode_question_pad_and_truncate():
    w2w = {"<pad>": 0, "<unk>": 1, "cat": 2, "red": 3}
    row, length = encode_question(["cat", "zebra", "red"], w2w, maxlength=5, pad="right")
    assert row.tolist() == [2, UNK_ID, 3, PAD_ID, PAD_ID] and length == 3
    row, length = encode_question(["cat", "zebra", "red"], w2w, maxlength=5, pad="left")
    assert row.tolist() == [PAD_ID, PAD_ID, 2, UNK_ID, 3]
    row, length = encode_question(["cat"] * 9, w2w, maxlength=4, pad="right")
    assert length == 4 and row.tolist() == [2, 2, 2, 2]


def test_encode_split_drops_oov_train_keeps_val():
    opt = VQAOptions(nans=3, maxlength=6)
    vocabs = Vocabs(
        wid_to_word=build_word_vocab(_examples(), "mcb", 0),
        aid_to_ans=build_answer_vocab(_examples(), 3),  # blue, rare-answer, red
    )
    train = encode_split(_examples(), vocabs, opt, is_train=True)
    # 'yes' is OOV -> example 3 dropped from train
    assert len(train) == 3 and 3 not in train.question_ids.tolist()
    val = encode_split(_examples(), vocabs, opt, is_train=False)
    assert len(val) == 4
    # OOV consensus in val keeps the row, marked -1
    assert val.answers[val.question_ids.tolist().index(3)] == -1


def test_answer_pool_marks_oov():
    opt = VQAOptions(nans=3, maxlength=6)
    vocabs = Vocabs(
        wid_to_word=["<pad>", "<unk>"],
        aid_to_ans=["blue", "rare-answer", "red"],
    )
    split = encode_split(_examples(), vocabs, opt, is_train=False)
    pool_row = split.answer_pool[0]  # red x8, blue, zebra
    assert (pool_row == 2).sum() == 8
    assert (pool_row == 0).sum() == 1
    assert (pool_row == -1).sum() == 1  # zebra OOV
