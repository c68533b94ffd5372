"""Table-name derivation (reference parity: utils.py:49-122).

These rules name the tables every downstream query addresses, so they must
match the reference byte-for-byte (SURVEY.md §7 "what's hard" #2); the
FIXTURES.md §3b table is the golden spec.
"""

from __future__ import annotations

import os
import re

_SEPARATORS = re.compile(r"[\s\-.]+")
_INVALID = re.compile(r"[^a-z0-9_]")
_SQUEEZE = re.compile(r"_+")

_VOWELS = frozenset("aeiou")
# Endings that take "es" in English pluralization.
_ES_ENDINGS = ("s", "x", "z", "ch", "sh")


def pluralize_word(word: str) -> str:
    """English pluralization (reference rules, utils.py:94-122):
    s/x/z/ch/sh → +es; consonant+y → ies; f/fe → ves; else +s."""
    if not word:
        return word
    if word.endswith(_ES_ENDINGS):
        return word + "es"
    if word.endswith("y") and len(word) > 1 and word[-2] not in _VOWELS:
        return word[:-1] + "ies"
    if word.endswith("fe"):
        return word[:-2] + "ves"
    if word.endswith("f"):
        return word[:-1] + "ves"
    return word + "s"


def resolve_table_name(filename: str, pluralize: bool = False) -> str:
    """Filename → valid table identifier (reference rules, utils.py:49-91).

    basename → drop extension → lowercase → whitespace/hyphen/dot runs
    become "_" → drop other specials → trim + squeeze "_" → optional
    pluralization. E.g. "Sales Data.csv" → "sales_data".
    """
    stem = os.path.splitext(os.path.basename(filename))[0].lower()
    name = _SEPARATORS.sub("_", stem)
    name = _INVALID.sub("", name)
    name = _SQUEEZE.sub("_", name).strip("_")
    if pluralize and name:
        name = pluralize_word(name)
    return name
