"""Shared higher-order-function expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` exactly once per row and pass the result to ``fn``
    as a higher-order-function lambda variable.

    Catalyst's CollapseProject inlines intermediate projection columns into
    the lambdas that reference them, so an expensive array expression
    "materialized" in its own ``select`` is still re-evaluated once per
    element of any outer ``transform``/``aggregate`` that uses it.  Binding
    through ``transform(array(e), v -> fn(v))[0]`` forces single
    evaluation: ArrayTransform evaluates its argument once, then runs the
    lambda over the one element.
    """
    return F.transform(F.array(expr), fn)[0]
