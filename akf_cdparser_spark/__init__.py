"""akf_cdparser_spark — a PySpark-native analytics/extraction engine.

A from-scratch Spark rebuild of the query & data-processing capabilities of
UB-Mannheim/akf-cdparser (a Node.js batch converter that parses
Hoppenstedt-Aktienfuehrer CD-ROM HTML company profiles into nested JSON),
extended with a web-scale crawl frontier per the north rule:

* ``operators/`` — the per-document extraction kernel (vectorized Arrow UDFs
  over an interleaved text+media spans table) re-expressing the reference's
  30 category matchers (see SURVEY.md §2.2-§2.4).
* ``functions/`` — scalar string/regex kernels (SURVEY.md §2.5).
* ``crawl/`` — URL frontier + politeness scheduler + bloom/cuckoo seen-set
  (BASELINE.json north_rule), all DataFrame-first.
* ``analytics/`` — corpus analytics: LSE histograms (reference
  lib/lineSegmentAnalyzer.js) plus large-scale training-data ops
  (dedup, similarity search, text quality).
* ``plans/`` — relational query shell used by the driver correctness gate.

Everything here derives only from public knowledge: the Apache Spark API and
the reference repo's observable behavior. Reference citations in docstrings
are ``file:line`` within /root/reference for parity checking only; no code is
copied.
"""

__version__ = "0.1.0"
