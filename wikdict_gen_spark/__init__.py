"""wikdict_gen_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-imagining of the query/data-processing capabilities of
karlb/wikdict-gen (reference at /root/reference, studied for WHAT it
computes, not HOW) as a web-scale KG constructor over Common-Crawl-style
page tables:

    pages(url, warc_ts, html, text, lang)
      -> extract   (byte-identical text cleaning, Arrow-batched pandas UDFs)
      -> parse     (mention/structure detection -> raw fact tables)
      -> process   (normalization, importance scoring, entity linking)
      -> infer     (backlink evidence + 2-hop pivot composition)
      -> canonicalize (alias collapse via iterative connected components)
      -> materialize  (kg.nodes + kg.edges triple tables + metrics)

Everything is pyspark.sql DataFrame + vectorized pandas/Arrow UDFs; no
per-row Python UDFs anywhere on the hot path.
"""

__version__ = "0.1.0"
