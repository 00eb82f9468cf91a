"""newocr_spark — a PySpark-native OCR / media-text extraction engine.

A from-scratch, Spark-first re-expression of the recognition semantics of
MSPaintIDE/NewOCR (reference: /root/reference, Java). The engine operates on
Iceberg/Parquet tables of interleaved text+media documents:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Architecture (see SURVEY.md):
  * pixel-level work (binarize, connected components, 17-segment
    featurization, nearest-neighbour matching, merge rules, spacing) lives
    in vectorized numpy inside Arrow-batched ``mapInPandas`` UDFs
    (``newocr_spark.kernel``);
  * the trained font model is a small table broadcast to executors
    (``newocr_spark.model``);
  * everything relational (scan, explode, joins, re-assembly, checkpoint
    state) is the DataFrame API so Catalyst can push down/prune/broadcast
    (``newocr_spark.pipeline``).
"""

__version__ = "0.1.0"
