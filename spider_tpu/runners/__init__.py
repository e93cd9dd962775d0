"""Training engine. Importing registers runner classes."""
