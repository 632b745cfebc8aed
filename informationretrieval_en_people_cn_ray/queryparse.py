"""Query grammar — re-expression of the reference's ``QueryTree``
(``QueryTree.py:94-137``, token classification ``QueryTree.py:7-42``).

Surface (reference ``queries.txt:1-14``):

    keyword             election
    free text (ranked)  military conflict
    phrase              'german chancellor'
    prefix              isra*
    phrase-prefix       'new ye'*
    replyto             ReplyTo:107701851
    boolean             brexit AND economy | jared NOT kushner | eu OR 'x y'

Rules enforced exactly as the reference does (SURVEY.md §2.7 B3):

- operators are the literal uppercase words AND / OR / NOT;
- a query containing any operator is a *boolean* query → unranked id set
  (``SearchEngine.py:254-271``); otherwise it's *ranked* top-k;
- ``x NOT y`` is rewritten to ``x AND NOT y`` (``QueryTree.py:99``);
- an AND group must keep at least one positive term (all-negated is an
  error, ``QueryTree.py:53-59``);
- NOT directly under OR is an error (``QueryTree.py:69-71``).

Pure driver-side function — queries are tiny; no distribution needed
(SURVEY.md §2.2 M9).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class QueryParseError(ValueError):
    pass


@dataclass(frozen=True)
class Token:
    kind: str  # keyword | phrase | prefix | phrase_prefix | replyto
    value: str


@dataclass
class AndGroup:
    positive: list[Token] = field(default_factory=list)
    negative: list[Token] = field(default_factory=list)


@dataclass
class QueryPlan:
    kind: str  # "boolean" | "ranked"
    groups: list[AndGroup] = field(default_factory=list)  # boolean
    tokens: list[Token] = field(default_factory=list)  # ranked
    text: str = ""


_LEX = re.compile(r"'[^']*'\*?|\S+")
_OPS = {"AND", "OR", "NOT"}


def classify(raw: str) -> Token:
    """Non-operator lexeme → typed token (reference ``QueryTree.py:7-42``)."""
    if raw.startswith("ReplyTo:"):
        key = raw[len("ReplyTo:") :]
        try:
            int(key)
        except ValueError:
            raise QueryParseError(f"ReplyTo key must be an integer: {raw}")
        return Token("replyto", key)
    if raw.startswith("'"):
        if raw.endswith("'*"):
            return Token("phrase_prefix", raw[1:-2])
        if raw.endswith("'") and len(raw) >= 2:
            return Token("phrase", raw[1:-1])
        raise QueryParseError(f"unterminated phrase: {raw}")
    if raw.startswith("/") and raw.endswith("/") and len(raw) >= 3:
        # engine extension: /regex/ term token — matches whole dictionary
        # surface forms over the portable Python-re ∩ RE2 subset (the
        # lexer splits on whitespace, so the pattern itself must be
        # whitespace-free; a term regex never needs \\s).
        try:
            re.compile(raw[1:-1])
        except re.error as e:
            raise QueryParseError(f"bad regex token {raw}: {e}")
        return Token("regex", raw[1:-1])
    if raw.endswith("*") and len(raw) > 1 and raw.count("*") == 1:
        return Token("prefix", raw[:-1])
    if "*" in raw:
        # engine extension beyond the reference grammar: general wildcard
        # terms (leading / infix / multiple stars) — `*ow`, `s*a*`. A
        # lone trailing star keeps the reference's prefix semantics above.
        if raw.strip("*") == "":
            raise QueryParseError(f"wildcard needs at least one literal: {raw}")
        return Token("wildcard", raw)
    return Token("keyword", raw)


def parse(query: str) -> QueryPlan:
    lexemes = _LEX.findall(query.strip())
    if not lexemes:
        raise QueryParseError("empty query")
    if not any(l in _OPS for l in lexemes):
        return QueryPlan(
            kind="ranked",
            tokens=[classify(l) for l in lexemes],
            text=query,
        )

    # boolean: split on OR, then each group on AND with NOT markers
    or_groups: list[list[str]] = [[]]
    for l in lexemes:
        if l == "OR":
            if not or_groups[-1]:
                raise QueryParseError("OR missing left operand")
            or_groups.append([])
        else:
            or_groups[-1].append(l)
    if not or_groups[-1]:
        raise QueryParseError("OR missing right operand")

    groups: list[AndGroup] = []
    for g in or_groups:
        if g[0] == "NOT":
            # reference: OrNode children must not be negated (QueryTree.py:69-71)
            raise QueryParseError("NOT cannot appear directly under OR")
        ag = AndGroup()
        negate = False
        expect_term = True
        for l in g:
            if l == "AND":
                if expect_term:
                    raise QueryParseError("AND missing operand")
                expect_term = True
            elif l == "NOT":
                # both "a NOT b" and "a AND NOT b" arrive here
                negate = True
                expect_term = True
            else:
                tok = classify(l)
                if negate:
                    ag.negative.append(tok)
                    negate = False
                else:
                    ag.positive.append(tok)
                expect_term = False
        if expect_term:
            raise QueryParseError("dangling operator")
        if not ag.positive:
            raise QueryParseError(
                "AND group needs at least one positive term"
            )
        groups.append(ag)
    return QueryPlan(kind="boolean", groups=groups, text=query)
