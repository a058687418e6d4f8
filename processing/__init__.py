"""Drop-in `processing` package matching the reference's flat import style.

The reference app does `from processing.color_simplify import ...` with
`app/` on sys.path (see /root/reference/app/ui/main_window.py:32-36). This
package lets that UI code run unchanged against the TPU backend: each module
re-exports the compat implementation from image_segmenter_tpu.compat.
"""
