"""ocr_agent_ray — a Ray-Data-native document-extraction / data-processing engine.

A from-scratch reimplementation of the capabilities of the reference
``takuto-NA/ocr-agent`` (see /root/reference, SURVEY.md) on top of
``ray.data.Dataset``: interleaved text+media document tables flow through
``map_batches`` stages (zero-copy Arrow), stateful OCR inference runs in
actor pools, document assembly is the single keyed shuffle, and every
partition commits lineage + metrics to a checkpoint store for exact resume.

Nothing here ports the reference's code; the reference defines WHAT is
computed (span semantics, post-processing, ordering, skip rules) and this
package re-expresses it Ray-Data-first.
"""

__version__ = "0.1.0"
