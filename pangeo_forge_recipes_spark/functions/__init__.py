"""Shared scalar-expression builders for the extension operators.

Each text/metric expression is authored ONCE as a dialect template and
rendered for both Spark SQL and DuckDB SQL — structural parity between the
engine query and its correctness oracle."""

from .textexprs import TextExprs, render

__all__ = ["TextExprs", "render"]
