from vector_ray.data.transcripts import ensure_transcripts, generate_transcripts
from vector_ray.data.enrich_tables import ensure_enrichment_csvs

__all__ = ["ensure_transcripts", "generate_transcripts", "ensure_enrichment_csvs"]
