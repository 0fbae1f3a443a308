"""Lucene RegExp dialect — grammar-faithful parser + a small
range-transition automaton library.

Implements the syntax of ``util/automaton/RegExp.java`` (the
dk.brics.automaton grammar Lucene's RegexpQuery compiles): ANCHORED
whole-term matching with union ``|``, intersection ``&``, repetition
``? * + {n} {n,} {n,m}``, char classes ``[a-z] [^...]`` with the
Java predefined classes ``\\d \\D \\s \\S \\w \\W``, quoted literals
``"..."``, empty-language ``#``, any-string ``@``, numeric intervals
``<min-max>`` (``Automata.makeDecimalInterval`` semantics: fixed width
when both bounds have equal digit count, else any number of leading
zeros before a width-of-max representation), and the deprecated
complement ``~`` behind its opt-in flag — same flag constants and
defaults as the reference (``RegexpQuery`` builds with ``ALL``;
``~`` needs ``DEPRECATED_COMPLEMENT``).

Engine: Thompson-construction epsilon-NFA over codepoint ranges;
complement and intersection determinize via subset construction with
alphabet partitioning (complete-with-dead-state, flip / product).
Matching simulates the NFA with epsilon closures — terms are short and
query automata small, so no up-front full determinization is needed.
Named automata (``<identifier>``) resolve through the provider hook
(``RegExp.toAutomaton(AutomatonProvider)``, ``RegExp.java:737-752``):
pass ``automata`` as a dict (name -> Auto or sub-pattern string) or a
callable; a miss raises "'name' not found" like the reference."""

from __future__ import annotations

MAX_CP = 0x10FFFF

# syntax flags (RegExp.java:404-500)
INTERSECTION = 0x0001
EMPTY = 0x0004
ANYSTRING = 0x0008
AUTOMATON = 0x0010
INTERVAL = 0x0020
ALL = 0xFF
NONE = 0x0000
DEPRECATED_COMPLEMENT = 0x10000

_DET_STATE_CAP = 10_000  # determinization safety valve


class Auto:
    """Epsilon-NFA: per-state range transitions [(lo, hi, dst)] and
    epsilon edges; one start state, a set of accept states."""

    __slots__ = ("trans", "eps", "start", "accepts")

    def __init__(self, trans, eps, start, accepts):
        self.trans = trans
        self.eps = eps
        self.start = start
        self.accepts = accepts

    # ---- construction helpers -------------------------------------
    @staticmethod
    def empty_lang():
        return Auto([[]], [[]], 0, set())

    @staticmethod
    def epsilon():
        return Auto([[]], [[]], 0, {0})

    @staticmethod
    def char_class(ranges):
        rs = [(lo, hi) for lo, hi in ranges if lo <= hi]
        if not rs:
            return Auto.empty_lang()
        return Auto([[(lo, hi, 1) for lo, hi in rs], []], [[], []], 0, {1})

    @staticmethod
    def string(s: str):
        n = len(s)
        trans = [[(ord(c), ord(c), i + 1)] for i, c in enumerate(s)]
        trans.append([])
        return Auto(trans, [[] for _ in range(n + 1)], 0, {n})

    def _shifted(self, off: int):
        trans = [
            [(lo, hi, d + off) for lo, hi, d in row] for row in self.trans
        ]
        eps = [[d + off for d in row] for row in self.eps]
        return trans, eps

    @staticmethod
    def union(a: "Auto", b: "Auto"):
        at, ae = a._shifted(1)
        bt, be = b._shifted(1 + len(a.trans))
        trans = [[]] + at + bt
        eps = [[a.start + 1, b.start + 1 + len(a.trans)]] + ae + be
        accepts = {s + 1 for s in a.accepts} | {
            s + 1 + len(a.trans) for s in b.accepts
        }
        return Auto(trans, eps, 0, accepts)

    @staticmethod
    def concat(a: "Auto", b: "Auto"):
        at, ae = a._shifted(0)
        bt, be = b._shifted(len(a.trans))
        for s in a.accepts:
            ae[s] = ae[s] + [b.start + len(a.trans)]
        return Auto(
            at + bt, ae + be, a.start,
            {s + len(a.trans) for s in b.accepts},
        )

    @staticmethod
    def star(a: "Auto"):
        at, ae = a._shifted(1)
        eps = [[a.start + 1]] + ae
        for s in a.accepts:
            eps[s + 1] = eps[s + 1] + [0]
        return Auto([[]] + at, eps, 0, {0})

    @staticmethod
    def optional(a: "Auto"):
        return Auto.union(a, Auto.epsilon())

    @staticmethod
    def repeat(a: "Auto", n: int, m: "int | None"):
        """a{n,} when m is None else a{n,m} (RegExp makeRepeat)."""
        parts = [a] * n
        if m is None:
            parts.append(Auto.star(a))
        else:
            parts.extend([Auto.optional(a)] * (m - n))
        out = Auto.epsilon()
        for p in parts:
            out = Auto.concat(out, p)
        return out

    # ---- subset construction, complement, intersection -------------
    def _closure(self, states: frozenset) -> frozenset:
        seen = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for d in self.eps[s]:
                if d not in seen:
                    seen.add(d)
                    stack.append(d)
        return frozenset(seen)

    def determinize(self):
        """(dfa_trans, dfa_accepts, n_states): complete DFA (dead state
        included) over the partition of codepoint space induced by the
        NFA's range endpoints. dfa_trans[state] = sorted
        [(lo, hi, dst)] covering [0, MAX_CP]."""
        points = {0}
        for row in self.trans:
            for lo, hi, _ in row:
                points.add(lo)
                if hi + 1 <= MAX_CP:
                    points.add(hi + 1)
        cuts = sorted(points)
        segs = [
            (c, (cuts[i + 1] - 1) if i + 1 < len(cuts) else MAX_CP)
            for i, c in enumerate(cuts)
        ]
        start = self._closure(frozenset([self.start]))
        ids = {start: 0}
        order = [start]
        dtrans = []
        i = 0
        while i < len(order):
            cur = order[i]
            i += 1
            row = []
            for lo, hi in segs:
                nxt = set()
                for s in cur:
                    for tlo, thi, d in self.trans[s]:
                        if tlo <= lo and hi <= thi:
                            nxt.add(d)
                nf = self._closure(frozenset(nxt))
                j = ids.get(nf)
                if j is None:
                    j = ids[nf] = len(order)
                    order.append(nf)
                    if len(order) > _DET_STATE_CAP:
                        raise ValueError(
                            "regexp too complex (determinization cap)"
                        )
                row.append((lo, hi, j))
            dtrans.append(row)
        accepts = {
            i for i, st in enumerate(order) if st & self.accepts
        }
        return dtrans, accepts, len(order)

    @staticmethod
    def _from_dfa(dtrans, accepts):
        trans = [
            [t for t in row] for row in dtrans
        ]
        return Auto(trans, [[] for _ in trans], 0, set(accepts))

    @staticmethod
    def complement(a: "Auto"):
        dtrans, accepts, n = a.determinize()
        return Auto._from_dfa(
            dtrans, set(range(n)) - accepts
        )

    @staticmethod
    def intersection(a: "Auto", b: "Auto"):
        at, aacc, _ = a.determinize()
        bt, bacc, _ = b.determinize()
        ids = {(0, 0): 0}
        order = [(0, 0)]
        trans = []
        i = 0
        while i < len(order):
            sa, sb = order[i]
            i += 1
            row = []
            # merge the two complete range partitions
            ia = ib = 0
            ra, rb = at[sa], bt[sb]
            lo = 0
            while lo <= MAX_CP:
                while ra[ia][1] < lo:
                    ia += 1
                while rb[ib][1] < lo:
                    ib += 1
                hi = min(ra[ia][1], rb[ib][1])
                key = (ra[ia][2], rb[ib][2])
                j = ids.get(key)
                if j is None:
                    j = ids[key] = len(order)
                    order.append(key)
                    if len(order) > _DET_STATE_CAP:
                        raise ValueError(
                            "regexp too complex (product cap)"
                        )
                row.append((lo, hi, j))
                lo = hi + 1
            trans.append(row)
        accepts = {
            i
            for i, (sa, sb) in enumerate(order)
            if sa in aacc and sb in bacc
        }
        return Auto._from_dfa(trans, accepts)

    # ---- matching ---------------------------------------------------
    def matches(self, s: str) -> bool:
        cur = self._closure(frozenset([self.start]))
        for ch in s:
            c = ord(ch)
            nxt = set()
            for st in cur:
                for lo, hi, d in self.trans[st]:
                    if lo <= c <= hi:
                        nxt.add(d)
            if not nxt:
                return False
            cur = self._closure(frozenset(nxt))
        return bool(cur & self.accepts)


def _decimal_interval(imin: int, imax: int, digits: int) -> Auto:
    """Automata.makeDecimalInterval: fixed ``digits`` width when > 0;
    otherwise any number of leading zeros before a width-of-max
    representation (Automata.java:484-513)."""
    y = str(imax)
    if digits > 0 and len(y) > digits:
        raise ValueError("interval bounds exceed digit width")
    d = digits if digits > 0 else len(y)
    lo_s = str(imin).rjust(d, "0")
    hi_s = y.rjust(d, "0")
    # positional DFA over states (i, tight_low, tight_high)
    ids: dict = {}
    trans: list = []
    accepts: set = set()

    def state(i, tl, th):
        key = (i, tl, th)
        j = ids.get(key)
        if j is None:
            j = ids[key] = len(trans)
            trans.append([])
            if i == d:
                accepts.add(j)
            else:
                lo_d = int(lo_s[i]) if tl else 0
                hi_d = int(hi_s[i]) if th else 9
                for dig in range(lo_d, hi_d + 1):
                    dst = state(
                        i + 1,
                        tl and dig == lo_d,
                        th and dig == hi_d,
                    )
                    trans[j].append(
                        (ord("0") + dig, ord("0") + dig, dst)
                    )
        return j

    start = state(0, True, True)
    core = Auto(trans, [[] for _ in trans], start, accepts)
    if digits > 0:
        return core
    return Auto.concat(Auto.star(Auto.string("0")), core)


class _Parser:
    """Recursive-descent parser mirroring RegExp.java's grammar
    productions (parseUnionExp .. parseCharExp) one for one."""

    def __init__(self, s: str, flags: int = ALL, automata=None):
        if (flags & ~DEPRECATED_COMPLEMENT) > ALL:
            raise ValueError("illegal syntax flag")
        self.s = s
        self.pos = 0
        self.flags = flags
        # named-automaton provider (RegExp.java REGEXP_AUTOMATON at
        # :737-752): dict name -> Auto | pattern string (compiled in the
        # same dialect, no nested provider), or a callable name ->
        # same | None.  A miss raises "'name' not found" like the
        # reference's IllegalArgumentException.
        self.automata = automata

    def check(self, flag: int) -> bool:
        return bool(self.flags & flag)

    def more(self) -> bool:
        return self.pos < len(self.s)

    def peek(self, chars: str) -> bool:
        return self.more() and self.s[self.pos] in chars

    def match(self, c: str) -> bool:
        if self.more() and self.s[self.pos] == c:
            self.pos += 1
            return True
        return False

    def next(self) -> str:
        if not self.more():
            raise ValueError("unexpected end of string")
        c = self.s[self.pos]
        self.pos += 1
        return c

    def parse(self) -> Auto:
        if self.s:
            a = self.parse_union()
        else:
            a = Auto.epsilon()
        if self.more():
            raise ValueError(f"end-of-string expected at position {self.pos}")
        return a

    def parse_union(self) -> Auto:
        a = self.parse_inter()
        while self.match("|"):
            a = Auto.union(a, self.parse_inter())
        return a

    def parse_inter(self) -> Auto:
        a = self.parse_concat()
        while self.check(INTERSECTION) and self.match("&"):
            a = Auto.intersection(a, self.parse_concat())
        return a

    def parse_concat(self) -> Auto:
        a = self.parse_repeat()
        while (
            self.more()
            and not self.peek(")|")
            and (not self.check(INTERSECTION) or not self.peek("&"))
        ):
            a = Auto.concat(a, self.parse_repeat())
        return a

    def parse_repeat(self) -> Auto:
        a = self.parse_compl()
        while self.peek("?*+{"):
            if self.match("?"):
                a = Auto.optional(a)
            elif self.match("*"):
                a = Auto.star(a)
            elif self.match("+"):
                a = Auto.repeat(a, 1, None)
            elif self.match("{"):
                start = self.pos
                while self.peek("0123456789"):
                    self.next()
                if start == self.pos:
                    raise ValueError(
                        f"integer expected at position {self.pos}"
                    )
                n = int(self.s[start : self.pos])
                m: "int | None" = None
                if self.match(","):
                    start = self.pos
                    while self.peek("0123456789"):
                        self.next()
                    if start != self.pos:
                        m = int(self.s[start : self.pos])
                else:
                    m = n
                if not self.match("}"):
                    raise ValueError(
                        f"expected '}}' at position {self.pos}"
                    )
                if m is not None and n > m:
                    raise ValueError(
                        f"invalid repetition range(out of order): {n}..{m}"
                    )
                a = Auto.repeat(a, n, m)
        return a

    def parse_compl(self) -> Auto:
        if self.check(DEPRECATED_COMPLEMENT) and self.match("~"):
            return Auto.complement(self.parse_compl())
        return self.parse_char_class_exp()

    def parse_char_class_exp(self) -> Auto:
        if self.match("["):
            negate = self.match("^")
            ranges = self.parse_char_classes()
            a = Auto.char_class(ranges)
            if negate:
                a = Auto.intersection(
                    Auto.char_class([(0, MAX_CP)]), Auto.complement(a)
                )
            if not self.match("]"):
                raise ValueError(f"expected ']' at position {self.pos}")
            return a
        return self.parse_simple()

    _LETTERS = (
        "\\ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    )

    def parse_char_classes(self) -> list:
        ranges: list = []
        while True:
            if self.match("\\"):
                if self.peek(self._LETTERS):
                    self._expand_predefined(ranges)
                else:
                    c = self.next()
                    ranges.append((ord(c), ord(c)))
            else:
                c = self.parse_char()
                if self.match("-"):
                    ranges.append((c, self.parse_char()))
                else:
                    ranges.append((c, c))
            if not (self.more() and not self.peek("]")):
                break
        return ranges

    def _expand_predefined(self, ranges: list) -> None:
        # expandPreDefined (RegExp.java:1415-1484)
        if self.peek("\\"):
            ranges.append((ord("\\"), ord("\\")))
            self.next()
        elif self.peek("d"):
            ranges.append((ord("0"), ord("9")))
            self.next()
        elif self.peek("D"):
            ranges.append((0, ord("0") - 1))
            ranges.append((ord("9") + 1, MAX_CP))
            self.next()
        elif self.peek("s"):
            ranges.extend(
                [(9, 10), (13, 13), (32, 32)]
            )
            self.next()
        elif self.peek("S"):
            ranges.extend(
                [(0, 8), (11, 12), (14, 31), (33, MAX_CP)]
            )
            self.next()
        elif self.peek("w"):
            ranges.extend(
                [
                    (ord("0"), ord("9")),
                    (ord("A"), ord("Z")),
                    (ord("_"), ord("_")),
                    (ord("a"), ord("z")),
                ]
            )
            self.next()
        elif self.peek("W"):
            ranges.extend(
                [
                    (0, ord("0") - 1),
                    (ord("9") + 1, ord("A") - 1),
                    (ord("Z") + 1, ord("_") - 1),
                    (ord("_") + 1, ord("a") - 1),
                    (ord("z") + 1, MAX_CP),
                ]
            )
            self.next()
        elif self.peek(
            "abcefghijklmnopqrtuvxyzABCEFGHIJKLMNOPQRTUVXYZ"
        ):
            raise ValueError(
                f"invalid character class \\{self.next()}"
            )

    def _match_predefined(self) -> "list | None":
        if self.match("\\"):
            if self.peek(self._LETTERS):
                ranges: list = []
                self._expand_predefined(ranges)
                return ranges
            # backslash consumed; parse_char treats the next char
            # as a literal (mirrors the short-circuit in
            # matchPredefinedCharacterClass + parseCharExp)
        return None

    def parse_simple(self) -> Auto:
        if self.match("."):
            return Auto.char_class([(0, MAX_CP)])
        if self.check(EMPTY) and self.match("#"):
            return Auto.empty_lang()
        if self.check(ANYSTRING) and self.match("@"):
            return Auto.star(Auto.char_class([(0, MAX_CP)]))
        if self.match('"'):
            start = self.pos
            while self.more() and not self.peek('"'):
                self.next()
            if not self.match('"'):
                raise ValueError(f"expected '\"' at position {self.pos}")
            return Auto.string(self.s[start : self.pos - 1])
        if self.match("("):
            if self.match(")"):
                return Auto.epsilon()
            a = self.parse_union()
            if not self.match(")"):
                raise ValueError(f"expected ')' at position {self.pos}")
            return a
        if (self.check(AUTOMATON) or self.check(INTERVAL)) and self.match(
            "<"
        ):
            start = self.pos
            while self.more() and not self.peek(">"):
                self.next()
            if not self.match(">"):
                raise ValueError(f"expected '>' at position {self.pos}")
            body = self.s[start : self.pos - 1]
            i = body.find("-")
            if i == -1:
                if not self.check(AUTOMATON):
                    raise ValueError(
                        f"interval syntax error at position {self.pos - 1}"
                    )
                aa = None
                if isinstance(self.automata, dict):
                    aa = self.automata.get(body)
                elif callable(self.automata):
                    aa = self.automata(body)
                if isinstance(aa, str):
                    aa = _Parser(aa, self.flags).parse()
                if aa is None:
                    # RegExp.java:749-751
                    raise ValueError(f"'{body}' not found")
                return aa
            if not self.check(INTERVAL):
                raise ValueError(
                    f"illegal identifier at position {self.pos - 1}"
                )
            if (
                i == 0
                or i == len(body) - 1
                or i != body.rfind("-")
                or not body[:i].isdigit()
                or not body[i + 1 :].isdigit()
            ):
                raise ValueError(
                    f"interval syntax error at position {self.pos - 1}"
                )
            smin, smax = body[:i], body[i + 1 :]
            imin, imax = int(smin), int(smax)
            digits = len(smin) if len(smin) == len(smax) else 0
            if imin > imax:
                imin, imax = imax, imin
            return _decimal_interval(imin, imax, digits)
        pre = self._match_predefined()
        if pre is not None:
            return Auto.char_class(pre)
        return Auto.char_class([(self.parse_char(), ) * 2])

    def parse_char(self) -> int:
        self.match("\\")
        return ord(self.next())


def compile_lucene_regexp(pattern: str, flags: int = ALL, automata=None) -> Auto:
    """Parse a Lucene-dialect regexp into an automaton. ANCHORED:
    ``matches`` decides whole-term membership, like RegexpQuery.
    ``automata``: named-automaton provider for ``<identifier>`` syntax
    (dict name -> Auto | pattern string, or callable) — the
    ``RegExp.toAutomaton(AutomatonProvider)`` hook."""
    return _Parser(pattern, flags, automata).parse()


def lucene_regexp_matcher(pattern: str, flags: int = ALL, automata=None):
    """Predicate str -> bool (whole-term, Lucene dialect)."""
    auto = compile_lucene_regexp(pattern, flags, automata)
    return auto.matches


_SPECIALS = set('.[](){}|&?*+~"<>#@\\^-')


def literal_prefix(pattern: str) -> str:
    """Longest literal prefix every match must start with — the cheap
    syntactic analog of ``Operations.getCommonPrefix`` used for parquet
    row-group pushdown. Conservative: empty when the pattern contains a
    top-level union anywhere (``|`` makes any prefix wrong), and a
    leading char only counts when it is not special and not followed by
    a quantifier. Always a SUPERSET screen — the automaton decides."""
    if "|" in pattern:
        return ""
    out = []
    for i, c in enumerate(pattern):
        if c in _SPECIALS:
            break
        if i + 1 < len(pattern) and pattern[i + 1] in "?*{":
            break
        out.append(c)
    return "".join(out)
