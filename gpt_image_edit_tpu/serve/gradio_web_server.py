"""Module-run form of the Gradio server
(ref:univa/serve/gradio_web_server.py, a near-duplicate of ref:app.py —
here it IS the same implementation):

  python -m gpt_image_edit_tpu.serve.gradio_web_server --model_path ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from app import add_plain_text_watermark, build_demo, main  # noqa: E402,F401

if __name__ == "__main__":
    main()
