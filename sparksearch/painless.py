"""Painless-subset script compiler: script source → Catalyst Column.

The reference executes scripts (script query, script_fields, script_score,
script sort) through the Painless language module
(modules/lang-painless/src/main/antlr/PainlessParser.g4; contexts registered
in server/src/main/java/org/opensearch/script/ScriptModule.java). A Spark
port that interpreted scripts per row in Python would put a Python UDF on
the hot path of every scripted query. Instead this module compiles the
expression subset of Painless — the subset that covers the documented
search-context scripts: doc-values access, params, arithmetic, comparisons,
boolean logic, ternary/elvis, Math.*, string and date methods — directly
into a Catalyst ``Column`` tree. Scripts therefore run JVM-side inside
whole-stage codegen, exactly like hand-written DataFrame expressions, and
Catalyst can fold params (compiled to literals), push scripted filters into
the parquet scan, and prune columns.

Grammar (precedence as in Java / PainlessParser.g4):

    expr    := or ('?' expr ':' expr | '?:' expr)?
    or      := and ('||' and)*
    and     := eq ('&&' eq)*
    eq      := cmp (('=='|'!=') cmp)*
    cmp     := add (('<'|'<='|'>'|'>=') add)*
    add     := mul (('+'|'-') mul)*
    mul     := unary (('*'|'/'|'%') unary)*
    unary   := ('-'|'!') unary | '(' type ')' unary | postfix
    postfix := primary ('.' method-or-property)*
    primary := number | string | true | false | null | '(' expr ')'
             | 'doc' '[' string ']' | 'params' ('[' string ']' | '.' id)
             | '_score' | 'Math' '.' id '(' args ')' | id

Doc-values access ``doc['f'].value`` maps to ``F.col('f')``; every referenced
field is recorded in ``doc_fields`` so planners know which doc-values
columns to join. ``params`` are resolved at compile time to literals (the
reference compiles per (script, params-shape) too — ScriptService caches
compiled scripts). Unsupported constructs raise ``PainlessError`` at compile
time, never silently misbehave at run time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compile_script", "CompiledScript", "PainlessError"]


class PainlessError(ValueError):
    """Compile-time error: unsupported syntax or unknown name."""


_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<num>(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?[fFdD]?
        |\d+(?:[eE][+-]?\d+)[fFdD]?
        |\d+[fFdDlL]?)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\?:|&&|\|\||==|!=|<=|>=|[-+*/%!<>?:()\[\].,])
""", re.X)

#: binary operator → (precedence, Column builder)
_BINOPS = {
    "||": (1, lambda a, b: a | b),
    "&&": (2, lambda a, b: a & b),
    "==": (3, lambda a, b: a == b),
    "!=": (3, lambda a, b: a != b),
    "<": (4, lambda a, b: a < b),
    "<=": (4, lambda a, b: a <= b),
    ">": (4, lambda a, b: a > b),
    ">=": (4, lambda a, b: a >= b),
    "+": (5, lambda a, b: a + b),
    "-": (5, lambda a, b: a - b),
    "*": (6, lambda a, b: a * b),
    "/": (6, lambda a, b: a / b),
    "%": (6, lambda a, b: a % b),
}

#: Math.<name> → (arity, builder). Math.log is the natural log in Java.
_MATH = {
    "log": (1, F.log),
    "log10": (1, F.log10),
    "log1p": (1, F.log1p),
    "sqrt": (1, F.sqrt),
    "cbrt": (1, F.cbrt),
    "abs": (1, F.abs),
    "exp": (1, F.exp),
    "expm1": (1, F.expm1),
    "floor": (1, F.floor),
    "ceil": (1, F.ceil),
    "signum": (1, F.signum),
    "sin": (1, F.sin),
    "cos": (1, F.cos),
    "tan": (1, F.tan),
    "atan": (1, F.atan),
    "pow": (2, F.pow),
    "max": (2, F.greatest),
    "min": (2, F.least),
    "atan2": (2, F.atan2),
    "acos": (1, F.acos),
    "asin": (1, F.asin),
    "cosh": (1, F.cosh),
    "sinh": (1, F.sinh),
    "tanh": (1, F.tanh),
    # Java Math.round: floor(x + 0.5) as long
    "round": (1, lambda c: F.floor(c + 0.5).cast("long")),
    # widened surface (java.lang.Math rows of the painless spi allowlist,
    # modules/lang-painless/src/main/resources/org/opensearch/painless/
    # spi/java.lang.txt)
    "hypot": (2, F.hypot),
    "toRadians": (1, F.radians),
    "toDegrees": (1, F.degrees),
    "rint": (1, F.rint),
    "copySign": (2, lambda a, b: F.abs(a)
                 * F.when(b < 0, -1.0).otherwise(1.0)),
}

#: Math.<NAME> constants (java.lang.Math fields in the spi allowlist)
_MATH_CONSTS = {
    "PI": 3.141592653589793,
    "E": 2.718281828459045,
}

#: static calls on boxed types / String (java.lang.txt allowlist rows:
#: Integer.parseInt, Long.parseLong, Double.parseDouble,
#: Boolean.parseBoolean, String.valueOf)
_STATICS = {
    ("Integer", "parseInt"): lambda a: a.cast("int"),
    ("Integer", "toString"): lambda a: a.cast("string"),
    ("Long", "parseLong"): lambda a: a.cast("long"),
    ("Float", "parseFloat"): lambda a: a.cast("float"),
    ("Double", "parseDouble"): lambda a: a.cast("double"),
    ("Boolean", "parseBoolean"): lambda a: F.lower(a) == "true",
    ("String", "valueOf"): lambda a: a.cast("string"),
}

#: static constants on boxed types
_STATIC_CONSTS = {
    ("Integer", "MAX_VALUE"): 2147483647,
    ("Integer", "MIN_VALUE"): -2147483648,
    ("Long", "MAX_VALUE"): 9223372036854775807,
    ("Long", "MIN_VALUE"): -9223372036854775808,
}

_CASTS = {"int": "int", "long": "long", "float": "float",
          "double": "double", "boolean": "boolean", "String": "string",
          "byte": "byte", "short": "short"}


@dataclass(frozen=True)
class CompiledScript:
    """A compiled script: the Catalyst column plus the doc-values fields it
    reads (planners join exactly these columns from the docs table)."""
    source: str
    col: Column
    doc_fields: frozenset

    def column(self) -> Column:
        return self.col


def compile_script(source: str, params: dict | None = None,
                   score_col: str = "score") -> CompiledScript:
    """Compile a Painless expression to a Catalyst column.

    ``_score`` in the script resolves to ``F.col(score_col)``; ``doc['f']``
    value access resolves to ``F.col('f')`` and records ``f`` in
    ``doc_fields``. ``params.x`` resolves to a literal at compile time."""
    p = _Parser(source, params or {}, score_col)
    col = p.parse()
    return CompiledScript(source, col, frozenset(p.doc_fields))


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise PainlessError(f"bad character {src[i]!r} at {i} in script")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, src: str, params: dict, score_col: str):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0
        self.params = params
        self.score_col = score_col
        self.doc_fields: set[str] = set()

    # -- token helpers ------------------------------------------------------
    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        kind, val = self.next()
        if val != text:
            raise PainlessError(
                f"expected {text!r}, got {val!r} in {self.src!r}")

    def at(self, text: str) -> bool:
        return self.peek()[1] == text

    def eat(self, text: str) -> bool:
        if self.at(text):
            self.i += 1
            return True
        return False

    # -- grammar ------------------------------------------------------------
    def parse(self) -> Column:
        col = self.expr()
        kind, val = self.peek()
        if kind != "eof":
            raise PainlessError(f"trailing {val!r} in {self.src!r}")
        return col

    def expr(self) -> Column:
        cond = self.binary(1)
        if self.eat("?:"):            # elvis: a ?: b  ==  a != null ? a : b
            other = self.expr()
            return F.coalesce(cond, other)
        if self.eat("?"):
            then = self.expr()
            self.expect(":")
            other = self.expr()
            return F.when(cond, then).otherwise(other)
        return cond

    def binary(self, min_prec: int) -> Column:
        left = self.unary()
        while True:
            _, val = self.peek()
            op = _BINOPS.get(val)
            if op is None or op[0] < min_prec:
                return left
            self.i += 1
            right = self.binary(op[0] + 1)
            left = op[1](left, right)

    def unary(self) -> Column:
        if self.eat("-"):
            return -self.unary()
        if self.eat("!"):
            return ~self.unary()
        # cast: '(' typename ')' unary
        if self.at("("):
            kind, val = self.toks[self.i + 1]
            if (kind == "id" and val in _CASTS
                    and self.toks[self.i + 2][1] == ")"):
                self.i += 3
                return self.unary().cast(_CASTS[val])
        return self.postfix()

    def postfix(self) -> Column:
        col = self.primary()
        while self.eat("."):
            col = self.member(col)
        return col

    def primary(self) -> Column:
        kind, val = self.next()
        if val == "(":
            col = self.expr()
            self.expect(")")
            return col
        if kind == "num":
            return F.lit(_number(val))
        if kind == "str":
            return F.lit(_unquote(val))
        if kind != "id":
            raise PainlessError(f"unexpected {val!r} in {self.src!r}")
        if val == "true":
            return F.lit(True)
        if val == "false":
            return F.lit(False)
        if val == "null":
            return F.lit(None)
        if val == "Math":
            return self.math_call()
        if val in ("Integer", "Long", "Float", "Double", "Boolean",
                   "String") and self.at("."):
            return self.static_call(val)
        if val == "doc":
            return self.doc_access()
        if val == "params":
            return F.lit(self.param_value())
        if val == "_score":
            return F.col(self.score_col)
        # bare identifier — lang-expression style field reference
        self.doc_fields.add(val)
        return F.col(val)

    def math_call(self) -> Column:
        self.expect(".")
        _, name = self.next()
        if name in _MATH_CONSTS and not self.at("("):
            return F.lit(_MATH_CONSTS[name])
        try:
            arity, fn = _MATH[name]
        except KeyError:
            raise PainlessError(f"unknown function Math.{name}") from None
        self.expect("(")
        args = [self.expr()]
        while self.eat(","):
            args.append(self.expr())
        self.expect(")")
        if len(args) != arity:
            raise PainlessError(
                f"Math.{name} takes {arity} args, got {len(args)}")
        return fn(*args)

    def static_call(self, cls: str) -> Column:
        """Static method / constant on a boxed type or String
        (Integer.parseInt, Long.MAX_VALUE, String.valueOf, ...)."""
        self.expect(".")
        _, name = self.next()
        if (cls, name) in _STATIC_CONSTS and not self.at("("):
            return F.lit(_STATIC_CONSTS[(cls, name)])
        try:
            fn = _STATICS[(cls, name)]
        except KeyError:
            raise PainlessError(
                f"unsupported static {cls}.{name}") from None
        self.expect("(")
        arg = self.expr()
        self.expect(")")
        return fn(arg)

    def doc_access(self) -> Column:
        """doc['field'] followed by .value / .size() / .empty — the
        reference's ScriptDocValues accessors."""
        self.expect("[")
        kind, val = self.next()
        if kind != "str":
            raise PainlessError("doc[...] requires a string field name")
        field = _unquote(val)
        self.expect("]")
        self.doc_fields.add(field)
        col = F.col(field)
        # .value / .size() / .empty (default to .value if chain ends)
        if not self.eat("."):
            return col
        _, name = self.next()
        if name == "value":
            return col
        if name == "size":
            self.expect("(")
            self.expect(")")
            return F.when(col.isNull(), 0).otherwise(1)
        if name == "empty":
            return col.isNull()
        # any other method applies to the value itself (e.g. .getMillis())
        return self.method(col, name)

    def member(self, col: Column) -> Column:
        _, name = self.next()
        if name == "value":          # tolerate .value after .value-chains
            return col
        return self.method(col, name)

    def method(self, col: Column, name: str) -> Column:
        """String / date instance methods on a value column."""
        if name == "empty":
            return col.isNull()
        if name == "millis":         # JodaCompatibleZonedDateTime.getMillis
            return F.unix_millis(col)
        self.expect("(")
        args = []
        if not self.at(")"):
            args.append(self.expr())
            while self.eat(","):
                args.append(self.expr())
        self.expect(")")
        n = len(args)
        if name == "length" and n == 0:
            return F.length(col)
        if name == "size" and n == 0:
            return F.when(col.isNull(), 0).otherwise(1)
        if name == "contains" and n == 1:
            return col.contains(args[0])
        if name == "startsWith" and n == 1:
            return col.startswith(args[0])
        if name == "endsWith" and n == 1:
            return col.endswith(args[0])
        if name == "equals" and n == 1:
            return col == args[0]
        if name == "toLowerCase" and n == 0:
            return F.lower(col)
        if name == "toUpperCase" and n == 0:
            return F.upper(col)
        if name == "trim" and n == 0:
            return F.trim(col)
        if name == "isEmpty" and n == 0:
            return F.length(col) == 0
        if name == "indexOf" and n == 1:   # Java: 0-based, -1 if absent
            return F.instr(col, args[0]) - 1
        if name == "substring":            # Java substring(begin[, end])
            if n == 1:
                return col.substr(args[0] + 1, F.length(col))
            if n == 2:
                return col.substr(args[0] + 1, args[1] - args[0])
        if name == "replace" and n == 2:
            return F.replace(col, args[0], args[1])
        if name == "matches" and n == 1:   # Java matches: FULL match
            return F.regexp_like(
                col, F.concat(F.lit("^(?:"), args[0], F.lit(")$")))
        if name == "replaceAll" and n == 2:
            return F.regexp_replace(col, args[0], args[1])
        if name == "charAt" and n == 1:    # 0-based; 1-char string
            return F.substring(col, args[0] + 1, 1)
        if name == "concat" and n == 1:
            return F.concat(col, args[0])
        if name == "repeat" and n == 1:    # Java 11 String.repeat
            return F.repeat(col, args[0])
        if name == "split" and n == 1:
            return F.split(col, args[0])
        if name in ("getMillis", "toEpochMilli") and n == 0:
            return F.unix_millis(col)
        if name == "toInstant" and n == 0:
            return col
        if name == "getYear" and n == 0:
            return F.year(col)
        if name == "getMonthValue" and n == 0:
            return F.month(col)
        if name == "getDayOfMonth" and n == 0:
            return F.dayofmonth(col)
        if name == "getHour" and n == 0:
            return F.hour(col)
        raise PainlessError(f"unsupported method .{name}/{n}")

    def param_value(self):
        """params.x or params['x'] → the literal value."""
        if self.eat("."):
            _, name = self.next()
        else:
            self.expect("[")
            kind, val = self.next()
            if kind != "str":
                raise PainlessError("params[...] requires a string key")
            name = _unquote(val)
            self.expect("]")
        if name not in self.params:
            raise PainlessError(f"missing script param {name!r}")
        return self.params[name]


def _number(text: str):
    t = text.rstrip("fFdDlL")
    suffix = text[len(t):].lower()
    if suffix in ("f", "d") or "." in t or "e" in t.lower():
        return float(t)
    return int(t)


def _unquote(text: str) -> str:
    body = text[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


# ---------------------------------------------------------------------------
# lang-expression (modules/lang-expression) — Lucene expressions
# ---------------------------------------------------------------------------

#: the Lucene-expressions function set (JavascriptCompiler's builtins, the
#: list the reference's ExpressionScriptEngine exposes); haversin is the
#: one member with no Catalyst counterpart and raises at rewrite time
_EXPR_FNS = ("abs", "acos", "asin", "atan", "atan2", "ceil", "cos",
             "cosh", "exp", "floor", "log10", "max", "min", "pow",
             "sin", "sinh", "sqrt", "tan", "tanh")
_EXPR_FN_RE = re.compile(
    r"\b(ln|haversin|" + "|".join(_EXPR_FNS) + r")\s*\(")


def expression_to_painless(source: str) -> str:
    """Lower a lang-expression script to the painless expression subset.

    Lucene expressions (modules/lang-expression — ExpressionScriptEngine
    compiles via JavascriptCompiler) are numeric-only, JS-syntax
    expressions over ``doc['f'].value`` / ``_score`` bindings with BARE
    math function names (``ln(x)``, ``sqrt(x)``) instead of painless's
    ``Math.log(x)``.  The operator grammar is the shared Java precedence
    the painless parser already implements, so lowering = rewriting the
    function names; the compiled column is identical.  ``haversin`` has
    no Catalyst counterpart and is rejected loudly.
    """
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name == "haversin":
            raise PainlessError("expression function haversin( is not "
                                "supported (no geo fields in this corpus)")
        return "Math." + ("log" if name == "ln" else name) + "("
    return _EXPR_FN_RE.sub(sub, source)


def compile_expression(source: str, params: dict | None = None,
                       score_col: str = "score") -> CompiledScript:
    """Compile a lang-expression script: lower to painless, compile, and
    cast to double (expressions always evaluate to doubles)."""
    c = compile_script(expression_to_painless(source), params, score_col)
    return CompiledScript(source, c.col.cast("double"), c.doc_fields)
