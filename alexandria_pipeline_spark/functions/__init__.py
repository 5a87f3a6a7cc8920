"""Reusable column expressions (Spark) + mirrored DuckDB SQL fragments.

Each helper has two faces: a Spark Column expression used by the query
library, and a SQL-string generator producing the *same arithmetic in
the same fold order* for the DuckDB oracle. Keeping them adjacent is
what makes float results bitwise-comparable across engines.
"""
