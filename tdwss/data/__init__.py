from tdwss.data.batch import PointBatch, TextBatch  # noqa: F401
