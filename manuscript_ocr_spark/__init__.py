"""manuscript_ocr_spark — a PySpark-native extraction engine.

From-scratch reimplementation of the detect → recognize → reading-order
extraction pipeline of olegiy/manuscript-ocr (reference at /root/reference/,
see SURVEY.md), designed for an interleaved text+media document table at
10^12-document scale: DataFrame-declared plans, Arrow-vectorized pandas UDFs
for the numeric kernels, broadcast model weights, salted range partitioning,
and per-partition checkpoint/metrics for resumability.
"""

__version__ = "0.1.0"
