"""JAX model implementations: GTE-Qwen2 embedder, MiniCPM layerwise
reranker, Gemma token-compress reranker, plus HF weight loading."""
