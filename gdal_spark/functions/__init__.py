"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal column plumbing.

These are the operations a 100 TB image+caption corpus needs around the
geospatial core: caption/document quality scoring and language ID, exact
and near duplicate detection (the captions and pixels both), ANN search
over embedding columns, and typed binary multimodal handling. All are
DataFrame-first; Python appears only inside Arrow-vectorized UDFs.
"""
