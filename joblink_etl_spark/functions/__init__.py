from . import html, jsonld, predicates, provenance, text, url

__all__ = ["url", "html", "text", "jsonld", "provenance", "predicates"]
