"""Streaming surface (reference is pure batch — SURVEY.md §2.11; this
module exists because a transcript firehose is the natural production
source: same extraction core, Structured Streaming plumbing)."""
