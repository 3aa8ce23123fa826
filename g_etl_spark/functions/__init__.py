"""Column-builder function library (the reference's macro layer).

The reference exposes 28 inline SQL macros (g_* prefix,
sql/migrations/003_db_makros.sql:12-166). Here each macro family is a
Python module of Column builders — composition of Spark built-ins that
Catalyst inlines, preserving the reference's "expression function"
property (SURVEY §2.8):

- core:  text cleanup, metadata hashes, classification, dates
- grid:  hierarchical spatial grid cells (the H3-equivalent index)
- geo:   WKT/WKB geometry ops (pure-Python pandas UDFs; h3/shapely
         adapters slot in when available)
"""
