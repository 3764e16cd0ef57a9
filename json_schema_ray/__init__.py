"""json_schema_ray — a Ray-Data-native schema + constraint validation
engine with the keyword semantics of brandur/json_schema (draft-04),
re-expressed as vectorized Arrow compute over ``ray.data.Dataset``
pipelines.

Layering:

- pure-Python compile phase (no Ray): ``parser`` / ``expander`` /
  ``schema`` / ``pointer`` / ``reference`` / ``document_store``
- row-interpreter oracle: ``interpreter`` (exact reference semantics)
- data plane (Ray Data): ``engine.*`` — vectorized validation,
  stats/sketches, uniqueness/ordering, drift, dedup, similarity, text
"""

from .config import configuration, configure
from .document_store import DocumentStore
from .errors import AggregateError, SchemaError, ValidationError
from .interpreter import Validator
from .parser import Parser, parse, parse_bang
from .expander import ReferenceExpander
from .schema import Link, Media, Schema

__all__ = [
    "AggregateError",
    "DocumentStore",
    "Link",
    "Media",
    "Parser",
    "ReferenceExpander",
    "Schema",
    "SchemaError",
    "ValidationError",
    "Validator",
    "configuration",
    "configure",
    "parse",
    "parse_bang",
]
