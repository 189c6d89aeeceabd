"""Composite operators: reusable DataFrame -> DataFrame transforms.

Domain pipeline stages (align, assemble, observe, statistics,
interpolate, split) plus the large-scale training-data operators
(dedup, similarity, text, multimodal).
"""
