from .vectors import cosine_similarity_col, dot_product_col, l2_norm_col

__all__ = ["cosine_similarity_col", "dot_product_col", "l2_norm_col"]
