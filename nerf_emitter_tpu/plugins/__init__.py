"""Plugin registration for external methods and dataparsers.

Reference: nerfstudio/plugins/ (registry.py, registry_dataparser.py,
types.py).
"""

from .registry import discover_dataparsers, discover_methods
from .types import DataParserSpecification, MethodSpecification

__all__ = [
    "DataParserSpecification",
    "MethodSpecification",
    "discover_dataparsers",
    "discover_methods",
]
