"""Driver-contract query implementations, grouped per SURVEY.md §2.

Modules register via ``postpy_spark.registry.query``; importing the package
through ``registry.load_all()`` populates the contract dict.
"""
