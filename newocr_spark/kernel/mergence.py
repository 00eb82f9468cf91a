"""Mergence — post-match repair rules (SURVEY §2e: M1-M6).

Faithful re-expression of DefaultMergenceManager + the five default rules
(recognition/mergence/DefaultMergenceManager.java,
recognition/mergence/rules/*.java). Rules run sorted ascending by priority
index with registration order as tiebreak (beginMergence:71; priorities
MergePriority.java:11-16, registration loadDefaults:55-61), which computes
to: UnderDot(LOW), EqualVertical(LOW), OverDot(HIGH), Apostrophe(HIGH),
Percent(HIGH). (The enum's HIGHEST==-2 quirk means HIGH-priority rules
actually run last; replicated as computed, not as documented.)

After each rule, its merged-away pieces are removed from the line lists
(removeFromSorted:127-138, with the lazy-stream sequencing of
beginMergence:78); emptied lines are dropped only when removeFromSorted
itself did the removal. The final cleanup pass (processLetter:88-108)
relabels leftover dots to '.' and pops the next-closest NN match for pieces
that should only exist merged.

Determinism note: the reference iterates ConcurrentHashMaps (nondeterministic
order); we iterate letters in reading order (line insertion order, then
position in line), and sort vertical relations by (y) with a stable sort —
deterministic, and identical to the reference where its behavior is defined.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ..letters import APOSTROPHE_COMPARE_EXCLUDED

if TYPE_CHECKING:  # pragma: no cover
    from ..model import FontModel
    from .scan import ImageLetter


def _percent_diff(one: float, two: float) -> float:
    return 1.0 - (min(one, two) / max(one, two))


class _Ctx:
    """Shared per-image mergence context: similarity sets + trained meta."""

    def __init__(self, model: "FontModel") -> None:
        sims = model.config.similarities
        self.dot = sims["dot"]
        self.vline = sims["vertical-line"]
        self.hline = sims["horizontal-line"]
        self.pdot = sims["percent-dot"]
        self.pbase = sims["percent-base"]
        meta = model.meta
        self.distancei = meta.get("distancei", 0.0)
        self.distancej = meta.get("distancej", 0.0)
        self.colon_distance = meta.get("colonDistance", 0.0)
        self.semicolon_distance = meta.get("semicolonDistance", 0.0)
        self.equals_distance = meta.get("equalsDistance", 0.0)
        self.distance_question = meta.get("distanceQuestion", 0.0)
        self.distance_exclamation = meta.get("distanceExclamation", 0.0)
        self.apostrophe_ratio = meta.get("apostropheRatio", 0.0)

    def is_dot(self, l: "ImageLetter") -> bool:
        return (l.letter, l.mod) in self.dot

    def is_vline(self, l: "ImageLetter") -> bool:
        return (l.letter, l.mod) in self.vline

    def is_hline(self, l: "ImageLetter") -> bool:
        return (l.letter, l.mod) in self.hline


# ---------------- the five rules ----------------
# each: (ctx, target, context_list, pos) -> merged-away letters, or None;
# pos is the index of target in context_list (the manager tracks it so the
# reference's per-call indexOf scans are O(1) here)


def _under_dot(ctx: _Ctx, target, data, pos):  # M2 — rules/UnderDotMergeRule.java:57-93
    idx = pos + 1
    if len(data) <= idx:
        return None
    if (target.letter, target.mod) == ("?", 1) and not ctx.is_vline(target):
        return None
    question = (target.letter, target.mod) == ("?", 0)
    below = data[idx]
    if not ctx.is_dot(below):
        return None
    if target.amount_of_merges > 0 or below.amount_of_merges > 0:
        return None
    difference = abs(below.y - (target.y + target.height))
    is_below_base = below.height < target.height
    projected = (ctx.distance_question if question else ctx.distance_exclamation) * target.height
    if abs(difference - projected) <= projected * 0.75:
        base = below if not is_below_base else target
        adding = target if not is_below_base else below
        base.merge(adding)
        if base.letter != "?":
            base.letter = "!"
        return [adding]
    return None


def _equal_vertical(ctx: _Ctx, target, data, pos):  # M5 — rules/EqualVerticalMergeRule.java:55-92
    idx = pos + 1
    if len(data) <= idx:
        return None
    nxt = data[idx]
    if target.amount_of_merges > 0 or nxt.amount_of_merges > 0:
        return None
    difference = nxt.y - target.y - target.height
    is_part_above = nxt.height < target.height
    min_height = min(nxt.height, target.height)
    if ctx.is_hline(target) and ctx.is_hline(nxt):
        projected = ctx.equals_distance * min_height
        colon = False
    elif ctx.is_dot(target) and ctx.is_dot(nxt):
        projected = ctx.colon_distance * min_height
        colon = True
    else:
        return None
    if abs(difference - projected) <= projected * 0.5:
        base = nxt if not is_part_above else target
        adding = target if not is_part_above else nxt
        base.merge(adding)
        base.letter = ":" if colon else "="
        return [adding]
    return None


def _over_dot(ctx: _Ctx, target, data, pos):  # M1 — rules/OverDotMergeRule.java:57-117
    idx = pos - 1
    if idx < 0:
        return None
    tl = target.letter
    semicolon = (tl == ";" and target.mod == 1) or tl == ","
    vertical_target = ctx.is_vline(target)
    if (
        not semicolon
        and not vertical_target
        and not (tl == "j" and target.mod == 1)
        and tl != "J"
    ):
        return None
    above = data[idx]
    if not ctx.is_dot(above):
        return None
    if target.amount_of_merges > 0 or above.amount_of_merges > 0:
        return None
    if semicolon:
        distance = ctx.semicolon_distance
    elif tl in ("j", "J"):
        distance = ctx.distancej
    else:
        distance = ctx.distancei
    difference = abs(above.y + above.height - target.y)
    is_part_above = above.height < target.height
    max_height = max(above.height, target.height)
    projected = distance * max_height
    if abs(difference - projected) <= projected * 0.5:
        base = above if not is_part_above else target
        adding = target if not is_part_above else above
        base.merge(adding)
        using = tl
        if using == "J":
            using = "j"
        elif using == ",":
            using = ";"
        elif vertical_target:
            using = "i"
        base.letter = using
        return [adding]
    return None


def _apostrophe(ctx: _Ctx, target, data, pos):  # M3 — rules/ApostropheMergeRule.java:52-97
    if not ctx.is_vline(target):
        return None
    idx = pos - 1
    if len(data) <= idx or idx < 0:
        return None
    before = data[idx]
    if target.amount_of_merges > 0 or before.amount_of_merges > 0:
        return None
    if not ctx.is_vline(before):
        return None
    if _percent_diff(target.height, before.height) >= 0.25:
        return None
    compare = None
    for cur in data:
        if cur is target or cur is before or (cur.letter, cur.mod) in APOSTROPHE_COMPARE_EXCLUDED:
            continue
        compare = cur
        break
    if compare is not None:
        if _percent_diff(compare.height, target.height) <= 0.5:
            return None
    avg_length = before.height * ctx.apostrophe_ratio
    if target.x - before.x <= avg_length:
        before.letter = '"'
        before.merge(target)
        return [target]
    return None


def _percent(ctx: _Ctx, target, data, pos):  # M4 — rules/PercentMergeRule.java:43-101
    bi = pos
    if bi - 1 < 0 or bi + 1 >= len(data):
        return None
    part1 = data[bi - 1]
    part2 = data[bi + 1]
    if (
        target.amount_of_merges > 0
        or part1.amount_of_merges > 0
        or part2.amount_of_merges > 0
    ):
        return None

    def is_pdot(l):
        return (l.letter, l.mod) in ctx.pdot

    def is_pbase(l):
        return (l.letter, l.mod) in ctx.pbase

    one_d, two_d, three_d = is_pdot(target), is_pdot(part1), is_pdot(part2)
    one_b, two_b, three_b = is_pbase(target), is_pbase(part1), is_pbase(part2)
    if one_d and two_d and three_b:
        base, dot1, dot2 = part2, target, part1
    elif one_d and two_b and three_d:
        base, dot1, dot2 = part1, target, part2
    elif one_b and two_d and three_d:
        base, dot1, dot2 = target, part1, part2
    else:
        return None
    if not base.overlaps_y(dot1) or not base.overlaps_y(dot2):
        return None
    base.merge(dot1)
    base.merge(dot2)
    base.mod = 0
    base.letter = "%"
    return [dot1, dot2]


# name → (rule_fn, is_horizontal); names mirror the reference's rule
# classes, registered reflectively from config
# (HOCONFontConfiguration.java:156-170). The execution order comes from
# FontConfig.merge_rules — its default is the computed priority order
# UnderDot(-1), EqualVertical(-1), OverDot(1), Apostrophe(1), Percent(1)
# (see module docstring).
RULE_REGISTRY = {
    "UnderDotMergeRule": (_under_dot, False),
    "EqualVerticalMergeRule": (_equal_vertical, False),
    "OverDotMergeRule": (_over_dot, False),
    "ApostropheMergeRule": (_apostrophe, True),
    "PercentMergeRule": (_percent, True),
}


def run_mergence(sorted_lines, model):
    """Run M1-M6 over [(y, [ImageLetter])]; returns the pruned line list."""
    ctx = _Ctx(model)

    all_letters = [l for _y, line in sorted_lines for l in line]  # reading order
    # vertical relations: all letters overlapping in X (incl. self), by Y.
    # One vectorized interval test replaces the reference's parallel-stream
    # O(n^2) object loop (DefaultMergenceManager.java:140-152); the stable
    # (y, reading-order) sort matches its Comparator.comparingInt(getY).
    import numpy as np

    n = len(all_letters)
    xs = np.fromiter((l.x for l in all_letters), np.int64, n)
    xe = np.fromiter((l.x + l.width for l in all_letters), np.int64, n)
    ys = np.fromiter((l.y for l in all_letters), np.int64, n)
    y_order = np.argsort(ys, kind="stable")
    xs_o, xe_o = xs[y_order], xe[y_order]
    vertical = {}
    for i, l in enumerate(all_letters):
        mask = (xe_o > xs[i]) & (xe[i] > xs_o)
        vertical[id(l)] = [all_letters[j] for j in y_order[mask]]
    line_of = {}
    for _y, line in sorted_lines:
        for l in line:
            line_of[id(l)] = line  # shared list reference, as in the reference

    removed_global = set()

    def positions_of(lst):
        return {id(x): i for i, x in enumerate(lst)}

    for rule_name in model.config.merge_rules:
        rule_fn, horizontal = RULE_REGISTRY[rule_name]
        removing: list = []
        removing_ids: set[int] = set()
        if horizontal:
            # iterate lines in insertion order = reading order
            for _y, line in sorted_lines:
                pos_map = positions_of(line)
                for letter in list(line):
                    lid = id(letter)
                    if lid in removed_global or lid in removing_ids:
                        continue
                    result = rule_fn(ctx, letter, line, pos_map[lid])
                    if result:
                        for r in result:
                            removing.append(r)
                            removing_ids.add(id(r))
                        # a letter appears only in its own line list, so
                        # the removeAll sweep (DefaultMergenceManager.java:117)
                        # only ever touches those lines
                        for r in result:
                            owner = line_of[id(r)]
                            owner[:] = [x for x in owner if id(x) not in removing_ids]
                        pos_map = positions_of(line)
        else:
            for letter in all_letters:
                lid = id(letter)
                if lid in removed_global or lid in removing_ids:
                    continue
                data = vertical[lid]
                result = rule_fn(ctx, letter, data, data.index(letter))
                if result:
                    # x-overlap is symmetric: a removed letter appears only
                    # in the lists of the letters in its own list, so the
                    # removeAll sweep only needs to touch those
                    affected: set[int] = set()
                    for r in result:
                        removing.append(r)
                        removing_ids.add(id(r))
                        affected.update(id(o) for o in vertical.get(id(r), ()))
                    for aid in affected:
                        lst = vertical.get(aid)
                        if lst is not None:
                            lst[:] = [x for x in lst if id(x) not in removing_ids]
        # drop as relation keys from both orientations + from the line lists
        for r in removing:
            removed_global.add(id(r))
            vertical.pop(id(r), None)
        # removeFromSorted: only drops a line when the removal happened here
        for r in removing:
            for entry in list(sorted_lines):
                _y, line = entry
                if r in line:
                    line.remove(r)
                    if not line:
                        sorted_lines.remove(entry)
                    break

    # cleanup pass (processLetter)
    for _y, line in sorted_lines:
        for letter in line:
            _process_letter(ctx, letter)
    return sorted_lines


def _process_letter(ctx: _Ctx, letter) -> None:
    """DefaultMergenceManager.processLetter (:88-108)."""
    while True:
        if letter.amount_of_merges > 0:
            return
        if ctx.is_dot(letter):
            letter.letter = "."
            letter.mod = 0
            return
        lt, mod = letter.letter, letter.mod
        if lt == "=" or (lt == ";" and mod == 1) or lt in ("j", '"', "%", "i", "!"):
            if not letter.has_next_closest():
                # the reference would throw here (ImageLetter.java:204); a
                # trained model always offers alternatives, so this only
                # guards degenerate test models
                return
            letter.set_next_closest()
            continue
        return
