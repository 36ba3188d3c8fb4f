"""Shared function library: multimodal (binary-column) kernels and other
reusable expression builders."""
