"""Column-level function library (text, multimodal).

Cross-engine integer-division note (empirically verified, r7): Spark's
registered ``div`` and DuckDB's ``//`` BOTH truncate toward zero —
``(-7)//10 = 0`` and ``div(-7, 10) = 0`` — so ``F.call_function("div",
a, b)`` is bit-identical to a ``//`` oracle for ANY operand signs.  (An
earlier advisory claimed DuckDB floors; it does not.  Python's ``//``
DOES floor — in-test python twins of a div/``//`` expression must use
truncating division on negative numerators.)
"""
