"""Resolving strategies — semantics of kgforge/core/commons/strategies.py:18-26."""

from enum import Enum, auto


class ResolvingStrategy(Enum):
    ALL_MATCHES = auto()                  # all results, exact or fuzzy, ranked
    BEST_MATCH = auto()                   # unique result, closest match
    EXACT_CASE_INSENSITIVE_MATCH = auto() # unique case-insensitive exact match
    EXACT_MATCH = auto()                  # unique exact match
