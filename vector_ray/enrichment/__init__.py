from vector_ray.enrichment.table import FileTable, Equals, BetweenDates, TableRegistry
from vector_ray.enrichment.stage import EnrichStage, enrich

__all__ = ["FileTable", "Equals", "BetweenDates", "TableRegistry", "EnrichStage", "enrich"]
