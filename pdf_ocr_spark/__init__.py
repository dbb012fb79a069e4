"""pdf_ocr_spark — a PySpark-native document-extraction analytics engine.

From-scratch reimplementation of the capabilities of the reference
single-node OCR service (yu2486789817/pdf-OCR, surveyed in SURVEY.md) as a
Spark-first batch pipeline over transcript tables, plus the relational /
training-data operator library in ``pdf_ocr_spark.relational``.
"""

__version__ = "0.1.0"
