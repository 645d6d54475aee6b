"""Column-level function library (text, multimodal)."""
