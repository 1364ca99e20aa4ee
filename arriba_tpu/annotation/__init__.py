"""Gene model: annotation tables, interval index, splice queries."""

from .tables import GeneTable, TranscriptTable, ExonTable, Annotation  # noqa: F401
from .index import IntervalIndex, combine_annotations  # noqa: F401
