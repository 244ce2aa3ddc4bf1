"""Experiment harness: config composition, driver, metrics, rendering."""
