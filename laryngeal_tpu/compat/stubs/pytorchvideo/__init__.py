"""pytorchvideo STUB — import-surface shim for running the reference
pipelines in environments without pytorchvideo (it is imported everywhere in
the reference but missing from its requirements.txt, SURVEY.md §2.1).

Only the symbols the HF-family datasets hard-import are provided
(``vivit_transformer/vivit_classifier/data_config/dataset.py:8``,
``timesformer/timesformer_classifier/data_config/dataset.py``):
``pytorchvideo.data.encoded_video.EncodedVideo`` whose ``from_path`` raises,
steering the reference datasets onto their own cv2 fallback decode path
(``dataset.py:296-369``) — the stub does NO decoding itself.

Used by ``scripts/reference_ab.py`` (prepend this directory's parent to
PYTHONPATH). NOT installed or imported by laryngeal_tpu itself.
"""
