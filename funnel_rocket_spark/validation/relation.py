"""Relation-expression parser.

The query's optional ``query.relation`` string combines conditions with
arbitrary and/or nesting, e.g. ``"$0 and ($1 or $made_purchase)"``. Conditions
are referenced by index (``$0``) or by their ``name`` attribute. Grammar parity
with the reference's PEG grammar (``/root/reference/frocket/common/validation/
relation_parser.py:42-52``), implemented here as a small hand-rolled
tokenizer + recursive-descent parser (no third-party PEG dependency).

Precedence note: the reference re-emits the token stream into a Pandas query
string where ``and``→``&`` and ``or``→``|``, so effective precedence is
Python's (AND binds tighter than OR). We emit a SQL boolean expression where
AND likewise binds tighter than OR — identical semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

IDENT_RE = re.compile(r"\$(?:[0-9]+|[a-z_][a-z_0-9]*)", re.IGNORECASE)
OPS = {"and": "AND", "or": "OR", "&&": "AND", "||": "OR"}


class RelationError(ValueError):
    pass


@dataclass(frozen=True)
class RelationToken:
    kind: str  # 'cond' | 'op' | 'lparen' | 'rparen'
    text: str
    condition_id: int | None = None


def _tokenize(expr: str) -> list[RelationToken]:
    tokens: list[RelationToken] = []
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "(":
            tokens.append(RelationToken("lparen", "("))
            i += 1
        elif ch == ")":
            tokens.append(RelationToken("rparen", ")"))
            i += 1
        elif ch == "$":
            m = IDENT_RE.match(expr, i)
            if not m:
                raise RelationError(f"Bad condition reference at '{expr[i:i+20]}'")
            tokens.append(RelationToken("cond", m.group(0)))
            i = m.end()
        elif expr.startswith(("&&", "||"), i):
            tokens.append(RelationToken("op", OPS[expr[i : i + 2]]))
            i += 2
        else:
            m = re.match(r"(and|or)\b", expr[i:], re.IGNORECASE)
            if not m:
                raise RelationError(f"Unexpected token at '{expr[i:i+20]}'")
            tokens.append(RelationToken("op", OPS[m.group(1).lower()]))
            i += m.end()
    return tokens


def _resolve(tok: RelationToken, count: int, names: dict[str, int]) -> int:
    body = tok.text[1:]
    if body.isdigit():
        cid = int(body)
        if cid >= count:
            raise RelationError(f"Condition no. {cid} does not exist")
        return cid
    cid = names.get(body.lower())
    if cid is None:
        raise RelationError(f"Condition named '{body}' does not exist")
    return cid


def parse_relation(
    relation: str, condition_count: int, named_conditions: dict[str, int]
) -> tuple[str, list[int]]:
    """Parse + validate a relation, return (sql_bool_expr_template, used_ids).

    The returned expression references conditions as ``{N}`` placeholders so the
    planner can substitute its own column names, e.g.
    ``"({0} AND ({1} OR {2}))"``.
    """
    tokens = _tokenize(relation.strip().lower())
    if not tokens:
        raise RelationError("Empty relation expression")

    used: list[int] = []
    pos = 0

    def primary() -> str:
        nonlocal pos
        if pos >= len(tokens):
            raise RelationError("Relation ended unexpectedly")
        tok = tokens[pos]
        if tok.kind == "cond":
            pos += 1
            cid = _resolve(tok, condition_count, named_conditions)
            used.append(cid)
            return "{%d}" % cid
        if tok.kind == "lparen":
            pos += 1
            inner = expression()
            if pos >= len(tokens) or tokens[pos].kind != "rparen":
                raise RelationError("Unbalanced parentheses in relation")
            pos += 1
            return f"({inner})"
        raise RelationError(f"Unexpected '{tok.text}' in relation")

    def expression() -> str:
        nonlocal pos
        parts = [primary()]
        while pos < len(tokens) and tokens[pos].kind == "op":
            op = tokens[pos].text
            pos += 1
            parts.append(op)
            parts.append(primary())
        return " ".join(parts)

    result = expression()
    if pos != len(tokens):
        raise RelationError(f"Trailing tokens in relation: '{tokens[pos].text}'")
    return result, used


def default_relation(condition_count: int) -> str:
    """All conditions ANDed — the default when no relation is given
    (reference ``query_validator.py:238-266``, default op ``consts.py:69``)."""
    return " AND ".join("{%d}" % i for i in range(condition_count))
