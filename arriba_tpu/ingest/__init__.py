"""Chimeric-alignment ingestion and read statistics."""
