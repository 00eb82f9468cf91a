"""Letter identity table and similarity sets.

Mirrors the reference's ``Letter`` enum — the 95 printable ASCII characters
plus space, where multi-part glyphs get one (char, modifier) entry per
connected piece (recognition/similarity/Letter.java:16-120) — and the
default similarity rules (similarity/rules/*.java, resources/fonts/Default.conf).
"""

from __future__ import annotations

# (char, modifier) pairs, in the reference enum's declaration order
# (Letter.java:17-120). Multi-part glyphs:
#   '!': 0=bar, 1=dot        '"': 0=left bar, 1=right bar
#   '%': 2=slash base, 1=first-found dot, 0=second dot
#   ':': 0=top dot, 1=bottom dot        ';': 0=top dot, 1=comma
#   '=': 0=top bar, 1=bottom bar        '?': 0=curve, 1=dot
#   'i': 0=dot, 1=stem                  'j': 0=dot, 1=hook
LETTERS: tuple[tuple[str, int], ...] = (
    ("!", 0), ("!", 1),
    ('"', 0), ('"', 1),
    ("#", 0), ("$", 0),
    ("%", 2), ("%", 1), ("%", 0),
    ("&", 0), ("'", 0), ("(", 0), (")", 0), ("*", 0), ("+", 0), (",", 0),
    ("-", 0), (".", 0), ("/", 0),
    ("0", 0), ("1", 0), ("2", 0), ("3", 0), ("4", 0), ("5", 0), ("6", 0),
    ("7", 0), ("8", 0), ("9", 0),
    (":", 0), (":", 1), (";", 0), (";", 1),
    ("<", 0), ("=", 0), ("=", 1), (">", 0),
    ("?", 0), ("?", 1),
    ("@", 0),
    *((c, 0) for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"),
    ("[", 0), ("\\", 0), ("]", 0), ("^", 0), ("_", 0), ("`", 0),
    *((c, 0) for c in "abcdefgh"),
    ("i", 0), ("i", 1), ("j", 0), ("j", 1),
    *((c, 0) for c in "klmnopqrstuvwxyz"),
    ("{", 0), ("|", 0), ("}", 0), ("~", 0),
    (" ", 0),
)

# Named pieces used by merge rules / the apostrophe exclusion list
EXCLAMATION = ("!", 0)
EXCLAMATION_DOT = ("!", 1)
QUOTE_LEFT = ('"', 0)
QUOTE_RIGHT = ('"', 1)
PERCENT_BASE = ("%", 2)
PERCENT_LDOT = ("%", 1)
PERCENT_RDOT = ("%", 0)
APOSTROPHE = ("'", 0)
ASTERISK = ("*", 0)
PLUS = ("+", 0)
COMMA = (",", 0)
MINUS = ("-", 0)
PERIOD = (".", 0)
FORWARD_SLASH = ("/", 0)
COLON_TOP = (":", 0)
COLON_BOTTOM = (":", 1)
SEMICOLON_TOP = (";", 0)
SEMICOLON_BOTTOM = (";", 1)
EQUALS_TOP = ("=", 0)
EQUALS_BOTTOM = ("=", 1)
QUESTION_MARK_TOP = ("?", 0)
QUESTION_MARK_BOTTOM = ("?", 1)
CARROT = ("^", 0)
UNDERSCORE = ("_", 0)
GRAVE = ("`", 0)
i_DOT = ("i", 0)
i_STEM = ("i", 1)
j_DOT = ("j", 0)
j_HOOK = ("j", 1)
PIPE = ("|", 0)
TILDE = ("~", 0)
SPACE = (" ", 0)
LOWER_L = ("l", 0)
LOWER_O = ("o", 0)

# Default similarity sets (DotSimilarityRule.java etc. / fonts/Default.conf:12-32).
# The HOCON Default.conf additionally puts lowercase 'o' in percent-dot and
# that is what the reference's font tests load, so we mirror the .conf sets.
DEFAULT_SIMILARITIES: dict[str, frozenset[tuple[str, int]]] = {
    "dot": frozenset(
        {PERIOD, COLON_TOP, COLON_BOTTOM, EXCLAMATION_DOT, SEMICOLON_TOP,
         i_DOT, j_DOT, QUESTION_MARK_BOTTOM}
    ),
    "horizontal-line": frozenset({MINUS, EQUALS_BOTTOM, EQUALS_TOP, UNDERSCORE}),
    "percent-dot": frozenset({PERCENT_LDOT, PERCENT_RDOT, LOWER_O}),
    "percent-base": frozenset({PERCENT_BASE, FORWARD_SLASH}),
    "vertical-line": frozenset(
        {APOSTROPHE, QUOTE_LEFT, QUOTE_RIGHT, PIPE, LOWER_L, i_STEM, EXCLAMATION}
    ),
}

# ApostropheMergeRule's "not a usable height reference" exclusion list
# (mergence/rules/ApostropheMergeRule.java:72)
APOSTROPHE_COMPARE_EXCLUDED: frozenset[tuple[str, int]] = frozenset(
    {EXCLAMATION_DOT, QUOTE_LEFT, QUOTE_RIGHT, PERCENT_LDOT, PERCENT_RDOT,
     APOSTROPHE, ASTERISK, PLUS, COMMA, MINUS, PERIOD, COLON_TOP, COLON_BOTTOM,
     SEMICOLON_TOP, SEMICOLON_BOTTOM, EQUALS_TOP, EQUALS_BOTTOM,
     QUESTION_MARK_BOTTOM, CARROT, UNDERSCORE, GRAVE, i_DOT, j_DOT, TILDE, SPACE}
)
