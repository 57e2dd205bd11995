"""Pure-Python readability core.

Everything in this package is plain Python with no Spark dependency so
it can run inside Arrow-batch UDF workers (shipped via --py-files).
"""
