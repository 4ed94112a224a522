"""Reusable Column-expression function families (vector math, hashing).

Everything here returns Column expressions built from pyspark.sql
built-ins — JVM-side, whole-stage-codegen-eligible, no Python UDFs.
"""
