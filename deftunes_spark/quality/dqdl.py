"""Parser for the reference's DQDL subset.

Grammar actually used (terraform/modules/data_quality/glue.tf:1-26):

    Rules = [ <rule> (, <rule>)* ]
    rule  := IsComplete "col"
           | ColumnLength "col" = N
           | Uniqueness "col" > FLOAT
           | ColumnValues "col" <= NUM      (also <, >=, > accepted)

``parse_dqdl`` accepts either the full ``Rules = [...]`` wrapper or a
bare comma-separated rule list and returns Rule objects.
"""

from __future__ import annotations

import re

from deftunes_spark.quality.rules import (
    ColumnLength,
    ColumnValues,
    IsComplete,
    Rule,
    Uniqueness,
)

_RULE_RE = re.compile(
    r"""
    (?P<kind>IsComplete|ColumnLength|Uniqueness|ColumnValues)
    \s+"(?P<col>[^"]+)"
    (?:\s*(?P<op><=|>=|=|<|>)\s*(?P<num>-?\d+(?:\.\d+)?))?
    """,
    re.VERBOSE,
)


def parse_dqdl(text: str) -> list[Rule]:
    body = text.strip()
    m = re.match(r"^Rules\s*=\s*\[(?P<body>.*)\]\s*$", body, re.DOTALL)
    if m:
        body = m.group("body")
    rules: list[Rule] = []
    pos = 0
    for m in _RULE_RE.finditer(body):
        between = body[pos : m.start()].strip()
        if between not in ("", ","):
            raise ValueError(f"unparseable DQDL fragment: {between!r}")
        pos = m.end()
        kind, col = m.group("kind"), m.group("col")
        op, num = m.group("op"), m.group("num")
        if kind == "IsComplete":
            if op:
                raise ValueError(f"IsComplete takes no comparison: {m.group(0)}")
            rules.append(IsComplete(col))
        elif kind == "ColumnLength":
            if op != "=":
                raise ValueError(f"ColumnLength needs '= N': {m.group(0)}")
            rules.append(ColumnLength(col, int(float(num))))
        elif kind == "Uniqueness":
            if op != ">":
                raise ValueError(f"Uniqueness needs '> ratio': {m.group(0)}")
            rules.append(Uniqueness(col, float(num)))
        else:  # ColumnValues
            if op is None:
                raise ValueError(f"ColumnValues needs a bound: {m.group(0)}")
            rules.append(ColumnValues(col, float(num), op=op))
    tail = body[pos:].strip()
    if tail not in ("", ","):
        raise ValueError(f"unparseable DQDL tail: {tail!r}")
    if not rules:
        raise ValueError("empty DQDL ruleset")
    return rules
