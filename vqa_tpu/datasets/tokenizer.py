"""Question tokenizers (SURVEY.md C4).

The reference lineage selects a tokenizer with the ``vqa.nlp`` option; the
default flavor ('mcb') strips VQA-style punctuation and splits on whitespace.
Behavior is specified here from the published VQA preprocessing convention
(SURVEY.md tag [K]) and pinned by golden tests in tests/test_tokenizer.py.
"""

from __future__ import annotations

import re
from typing import List

# Characters removed outright (question marks, quotes, commas, ...).
_REMOVE_RE = re.compile(r"[?!'\"$:@(),.;]")
# Characters treated as word separators.
_SEPARATE_RE = re.compile(r"[-/]")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9 ]")


def tokenize_mcb(text: str) -> List[str]:
    """MCB/VQA-style tokenization: lowercase, drop punctuation, split."""
    t = text.lower()
    t = _REMOVE_RE.sub("", t)
    t = _SEPARATE_RE.sub(" ", t)
    return [w for w in t.split() if w]


def tokenize_naive(text: str) -> List[str]:
    """Lowercase, map every non-alphanumeric to space, split."""
    t = _NON_ALNUM_RE.sub(" ", text.lower())
    return [w for w in t.split() if w]


_TOKENIZERS = {
    "mcb": tokenize_mcb,
    "naive": tokenize_naive,
}


def get_tokenizer(name: str):
    try:
        return _TOKENIZERS[name]
    except KeyError:
        raise KeyError(f"unknown tokenizer {name!r}; known: {sorted(_TOKENIZERS)}") from None
