"""Faithful Python port of the reference's LSE streak-grouping walk.

Re-expresses ``doGrouping`` + ``elementStreak``
(/root/reference/lib/lineSegmentAnalyzer.js:461-758, GROUPING_RANGE at
:21) over one token class's (sector -> occurrence-count) map. The walk is
imperative by design (streak detection with mutable checked flags, group
extraction around the inner maximum, removal + repeat) and operates on at
most ``n_sectors`` (=10) entries per class — it runs as a grouped-map over
token_class in the Spark plane (tiny groups, no scale concern).

Quirks of the reference preserved deliberately (byte-parity over elegance):

* a second rise after a found maximum ends the streak AND marks the rising
  element checked, so it can never start its own streak (:624-630);
* on that early break the current element's ctr is never pushed to the
  streak's ctrs array (:646 runs only when no break fired);
* in the descending branch the running maximum only moves when the current
  ctr is STRICTLY greater than maxCtr (:632), so a start-of-streak maximum
  is re-found later by ``findInnerMaximum`` rather than during the walk;
* a streak whose maximum sits in the last sector force-extends its stop
  index there (:649-651);
* ``calculateGroupspan``'s istart is set once at the first live ctr and
  never resets at gaps; only the span counter does (:532-553);
* single-element streaks are dropped (:652-654) — their elements stay
  ungrouped (groupSize 0);
* ``var nextElement`` (:605) is hoisted to doGrouping's FUNCTION scope, so
  when the walk steps past the last sector (v == length, sectorToCompare
  undefined) the comparison reuses the STALE element from a previous
  iteration — possibly a different key's — instead of terminating. A
  last-sector element can thereby form a phantom two-sector streak
  (stopIndex == length) and end up wrapped as a groupSize-1 group, and a
  second-rise break against the stale element marks a foreign element
  groupingChecked. Found by differential testing against the extracted
  reference source; reproduced faithfully.

The port is golden-locked against the reference source itself: the pytest
harness extracts doGrouping/elementStreak from the reference file and runs
them in a Node vm on randomized histograms (tests/test_lse_grouping.py).
"""

from __future__ import annotations


class _Streak:
    __slots__ = ("start", "stop", "max_index", "max_ctr", "ctrs", "key",
                 "group_span", "imax", "istart", "istop")

    def __init__(self):
        self.start = -1
        self.stop = -1
        self.max_index = -1
        self.max_ctr = -1
        self.ctrs: list = []
        self.key = None
        self.group_span = -1
        self.imax = -1
        self.istart = -1
        self.istop = -1

    def streak_length(self):
        if self.start != -1 and self.stop != -1:
            return self.stop - self.start + 1
        return None

    def remove_from_streak(self, cut_start: int, cut_stop: int) -> None:
        # JS assignment past the array end extends it with undefined
        if cut_stop >= len(self.ctrs):
            self.ctrs.extend([None] * (cut_stop + 1 - len(self.ctrs)))
        for i in range(cut_start, cut_stop + 1):
            self.ctrs[i] = None
        self.find_inner_maximum()
        self.calculate_groupspan()

    def find_inner_maximum(self) -> None:
        new_max, imax = -1, -1
        for i, c in enumerate(self.ctrs):
            if c and c > new_max:
                new_max, imax = c, i
        if imax != -1:
            self.imax = imax
        if new_max != -1 and imax != -1:
            self.max_index = self.start + imax
            self.max_ctr = new_max

    def calculate_groupspan(self) -> None:
        self.find_inner_maximum()
        imax = self.imax
        span_ctr, istart_set, istart, istop = 0, False, -1, -1
        max_grp_found = False
        for i, c in enumerate(self.ctrs):
            if c:
                span_ctr += 1
                istop = i
                if not istart_set:
                    istart_set, istart = True, i
                if i == imax:
                    max_grp_found = True
            else:
                if max_grp_found:
                    break
                span_ctr = 0
        self.istart, self.istop, self.group_span = istart, istop, span_ctr


def streak_grouping(class_sectors: dict[str, dict[int, int]],
                    n_sectors: int = 10,
                    grouping_range: int = 1,
                    insertion_rank: dict | None = None,
                    ) -> list[tuple[str, int, int, int]]:
    """Run the reference grouping over {token_class: {sector: ctr}}.

    Returns rows (token_class, sector, occurrences, group_size) of the final
    sectors holder — group_size is the number of merged source sectors for
    group elements and 0 for untouched originals (sectorOccurence defaults,
    ref :72-78).

    ``insertion_rank`` maps (key, sector) -> sortable rank and, when given,
    reproduces the reference's per-sector JS key-insertion order (keys
    insert into ``sectorsHolder[sectorPosition][key]`` the first time the
    pair appears during the line scan, :440-447; the walk's inner
    ``for key in sector`` then iterates that order, :580). Without it the
    per-sector order is ``class_sectors`` dict order, class-major — the
    historical pinning, kept for the independent per-class mode where
    order cannot matter."""
    entries = [(key, s, int(c))
               for key, by_sector in class_sectors.items()
               for s, c in by_sector.items()]
    if insertion_rank is not None:
        entries.sort(key=lambda e: insertion_rank[(e[0], e[1])])
    holder: list[dict] = [dict() for _ in range(n_sectors)]
    for key, s, c in entries:
        holder[s][key] = {"ctr": c, "checked": False,
                          "isGroup": False, "groupSize": 0}

    # -- phase 1: find element streaks (ref :577-663) ------------------------
    streaks: list[_Streak] = []
    # `var nextElement` hoists to doGrouping's function scope in the
    # reference (:605): it survives across v iterations, keys AND sectors,
    # and is only reassigned while v is inside the holder — see the module
    # docstring's last quirk. `nxt` mirrors that lifetime exactly.
    nxt = None
    for i in range(n_sectors):
        for key in list(holder[i].keys()):
            start_el = holder[i].get(key)
            if start_el is None or start_el["checked"]:
                continue
            current, cur_idx = start_el, i
            st = _Streak()
            st.start, st.key = i, key
            st.max_ctr, st.max_index = current["ctr"], i
            maximum_found = False
            for v in range(i + 1, n_sectors + 1):
                if v < n_sectors:
                    nxt = holder[v].get(key)
                if nxt is None:
                    current["checked"] = True
                    st.stop = cur_idx
                    st.ctrs.append(current["ctr"])
                    break
                elif nxt["ctr"] == current["ctr"]:
                    st.stop = v
                elif nxt["ctr"] > current["ctr"]:
                    st.stop = v
                    st.max_index = v
                    st.max_ctr = nxt["ctr"]
                    if maximum_found:
                        current["checked"] = True
                        nxt["checked"] = True
                        break
                else:
                    if current["ctr"] > st.max_ctr:
                        st.max_index = cur_idx
                        st.max_ctr = current["ctr"]
                        maximum_found = True
                    st.stop = v
                current["checked"] = True
                st.ctrs.append(current["ctr"])
                current, cur_idx = nxt, v
            if st.max_index == n_sectors - 1:
                st.stop = n_sectors - 1
            if st.start == st.stop:
                continue
            streaks.append(st)

    # -- phase 2: form groups around each streak maximum (ref :666-750) ------
    idx = 0
    while idx < len(streaks):
        st = streaks[idx]
        idx += 1
        st.calculate_groupspan()
        length = st.streak_length()
        if length is None or length == 1:
            continue
        start_possible = st.start + st.imax - grouping_range
        start_inner = st.start + st.istart
        start_g = start_inner if start_possible < start_inner else start_possible
        stop_possible = st.start + st.imax + grouping_range
        stop_inner = st.start + st.istop
        stop_g = stop_inner if stop_possible > stop_inner else stop_possible

        grouped = {"ctr": 0, "checked": True, "isGroup": True, "groupSize": 0}
        for x in range(start_g, stop_g + 1):
            item = holder[x].get(st.key)
            if item is None:
                continue
            grouped["ctr"] += item["ctr"]
            grouped["groupSize"] += 1
            del holder[x][st.key]
        holder[st.max_index][st.key] = grouped

        st.remove_from_streak(start_g - st.start, stop_g - st.start)
        if st.group_span > 1:
            idx -= 1  # repeat this streak (ref :745-748)

    out = []
    for s in range(n_sectors):
        for key, el in holder[s].items():
            out.append((key, s, el["ctr"],
                        el["groupSize"] if el["isGroup"] else 0))
    return out
