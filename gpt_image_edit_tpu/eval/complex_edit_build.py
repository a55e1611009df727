"""Complex-Edit build_dataset tooling: compound-instruction generation
(ref:univa/eval/complex-edit/build_dataset/generate_edits.py, prompt.py).

Pipeline per input image (ref:generate_edits.py:272-336):
1. SEQUENCE call: ask the MLLM for `max_complexity` atomic editing
   instructions drawn from the EDIT_CATEGORIES taxonomy (CoT + JSON).
2. SIMPLIFY call per step: make each instruction concise/technical.
3. COMPOUND calls for prefixes 2..N: fuse the first i atomic steps into one
   natural compound instruction; complexity-1 compound = the first atomic
   step verbatim (ref :311-316).
Results are written one json per image with original_sequence / sequence /
compound — the record shape the UCSC-VLAA/Complex-Edit release uses.

The EDIT_CATEGORIES taxonomy, the three prompt templates, and the few-shot
examples are PROTOCOL ASSETS kept byte-identical to the reference
(tests/test_eval_extra.py byte-compares them at test time) — generated
instructions are only comparable under identical generator prompts.

The MLLM client is injectable (`client.complete(messages, max_tokens,
temperature) -> str` with OpenAI-style messages); `OpenAIChatClient` is the
gpt-4o production backbone (needs the host-side `openai` package), tests
inject a scripted client.
"""

from __future__ import annotations

import base64
import json
import os
from typing import Dict, List, Optional

# -- protocol assets (ref:build_dataset/prompt.py, byte-identical) ---------

EDIT_CATEGORIES = [
    (
        "Object Manipulation and Transformation", [
            ("Add an Object", "Insert a new element into the image."),
            ("Remove an Object", "Eliminate an existing element from the image."),
            ("Replace an Object", "Swap one element with another."),
            ("Move an Object", "Change the position of an existing element within the image."),
            ("Resize an Object", "Adjust the size of an existing element."),
            ("Rotate an Object", "Rotate an element to a specified angle."),
            ("Duplicate an Object", "Create a copy of an existing element."),
        ],
    ),
    (
        "Color and Tone Adjustments", [
            ("Change Color", "Replace the color of an element with a specified color."),
            ("Apply Filter/Weather", "Add a color filter or weather effect to the entire image or specific parts."),
        ],
    ),
    (
        "Texture and Material Adjustments", [
            ("Change Texture", "Apply a texture to an element (e.g., change from metal to wood)."),
        ],
    ),
    (
        "Background and Environment", [
            ("Change Background", "Replace the background with a different scene or color."),
        ],
    ),
    (
        "Lighting and Shadows", [
            ("Adjust Lighting", "Change the overall lighting or lighting of specific elements."),
        ],
    ),
    (
        "Text and Symbols", [
            ("Add Text", "Insert text into the image."),
            ("Remove Text", "Eliminate existing text from the image."),
            ("Change Text Properties", "Modify font, color, size, or position of existing text."),
        ],
    ),
    (
        "Pose and Expression", [
            ("Change Pose", "Modify the stance or posture of a person or object."),
            ("Change Facial Expression", "Alter the facial expression of a character."),
        ],
    ),
    (
        "Composition and Cropping", [
            ("Crop Image", "Adjust the framing of the image by removing outer areas."),
            ("Reframe Composition", "Change the focus or arrangement of elements within the image."),
            ("Zoom In/Out", "Adjust the zoom level to focus on specific elements or show a broader view."),
        ],
    ),
    (
        "Special Effects", [
            ("Add Special Effects", "Introduce effects like glow, motion blur, or lens flare."),
            ("Remove Special Effects", "Eliminate existing special effects from the image."),
            ("Add Particles", "Insert particles like dust."),
            ("Remove Particles", "Remove existing particles from the image."),
        ],
    )
]


SEQUENCE_TEMPLATE = """Given an input image, write a sequence of {num} editing instructions for a instruction-based image editing model.
Each instruction should be simple, concise and belong to one of the valid atomic operations so that the full sequence can represent a complicated editing operation.
Don't include the purpose for the operation but only describe it in the instruction.

You need to pay attention to two critical issues.
1. As these instructions will be performed step-by-step, with each step's output image being the next step's input image, you need to consider the consistency for each instruction. \
For example, after removing an object, it should not be removed again. And after replacing one object with another, you can't alter the original object's color or other attributes.

2. Take consideration that this image editing model takes in the result of only one previous operation as input, therefore you need to prevent necessary information to be lost at each step. \
For example, "Replace an Object" or "Move an Object" should not be breakdown into "Remove an Object" and "Add an Object" as the information about the object would be lost for the addition. \
The same principle may apply to other operations.

Here are the valid options for atomic operations:
{options}

Explain your reasoning before give the answer.
"""


COMPOUND_TEMPLATE = """You are given an input image and a sequence of atomic editing instructions for an instruction-based image editing model.
Althought each instruction is atomic and simple, the full sequence can represent a complicated editing operation.

You need to write a single compound instruction that is equivalent to performing the editing sequence step-by-step.

Keep the language concise and technical. Don't include the purpose for the operation or any unnecessary information but only describe it in the instruction. \
For example, rather than "Remove the meshed fence from the image, introducing a sense of openness to the scene.", it is better to just write ""Remove the meshed fence".

Do not naively concatenate the atmoic operations together. Instead, write a natural, seamless instruction.
For example, rather than "Replace A with B, and change B's color to red", it is better to integrate these instructions as "Replace A with red B".

When composing this complicated instruction, you may change the order of atomic editing steps and break this instruction into multiple sentence as long as it is still equivalent to the sequentially performed atomic operations.

Explain your reasoning before give the answer.
"""


SIMPLIFY_TEMPLATE = """You are given an instruction for an instruction-based image editing model.
You are to refine the instruction to make it more concise and technical. Remove all the unnecessary information such as the purpose of the operation. \
For example, rather than "Remove the meshed fence from the image, introducing a sense of openness to the scene.", it is better to just write ""Remove the meshed fence".

Do not change the operation itself but only the expression of it.

Determine whether the instruction is already concise or needs simplification.
If it is concise, you can just copy it as is. Otherwise, provide a more concise version of the instruction.
"""

CATEGORY_NAMES = [name for _, cats in EDIT_CATEGORIES for name, _ in cats]

# few-shot examples injected into every generator call by the release
# pipeline (ref:generate_edits.py:95-153, byte-identical). The example
# image ships with the reference release (imgs/example_image.png).
EXAMPLE_CoT_SEQUENCE = {
    "reasoning": "The image depicts a whimsical scene with a girl jumping in a field of sunflowers, surrounded by \
butterflies under a clear sky. To create a more complex and dynamic scene, we introduce various elements and \
effects in a logical sequence. First, we replace the sunflower field with a grassy field to set a neutral \
background. Adding a full moon establishes a shift from a daytime setting to a nighttime atmosphere. Changing the \
moon's color to red enhances the dramatic effect. Removing the butterflies ensures consistency in the transformed \
scene. The girl's dress is altered to a gothic black dress to match the new theme, and her facial expression \
is changed to a grim look to further reinforce the dark aesthetic. Finally, applying a twilight filter blends \
the modifications together, ensuring a cohesive transformation. Each step logically builds upon the previous one, \
maintaining consistency and avoiding loss of critical information.",
    "sequence": [
        {"name": "Change Background", "instruction": "Replace the sunflower field with a grassy field."},
        {"name": "Add an Object", "instruction": "Add a bright full moon in the sky."},
        {"name": "Change Color", "instruction": "Change the color of the moon to a deep red."},
        {"name": "Remove an Object", "instruction": "Remove the butterflies."},
        {"name": "Replace an Object", "instruction": "Change the girl's dress to a gothic black dress."},
        {"name": "Change Facial Expression", "instruction": "Make the girl's face expression grim."},
        {"name": "Apply Filter/Weather", "instruction": "Apply a twilight filter."},
        {"name": "Add Text", "instruction": "Add a text saying 'Eerie Twilight'."},
    ]
}

EXAMPLE_CoT_COMPOUND = {
    "reasoning": "The sequence of instructions transforms a bright sunflower field into a darker, eerie twilight \
setting. The sunflower field is replaced with a grassy field, shifting the environment to a more neutral, open \
landscape. A full moon is added to the sky and then changed to a deep red, reinforcing a mysterious atmosphere. \
The removal of butterflies eliminates a lively element, further supporting the tone shift. The girl's dress is \
replaced with a gothic black dress, and her expression is altered to a grim look, aligning her appearance with the \
overall dark aesthetic. Add a text saying 'Eerie Twilight'. Finally, a twilight filter is applied, adjusting the \
lighting and color tones to unify the transformed scene.",
    "compound_instruction": "Change the sunflower field background to a grassy field. Add a deep red full moon in the \
sky. Remove the butterflies. Change the girl's dress to a gothic black dress and make her expression grim. Apply a \
twilight filter and enhance the eerie atmosphere."
}

EXAMPLE_SIMPLIFIED_POS_INPUT = "Apply a sunny filter onto the image to enhance overall skies and lighting."
EXAMPLE_SIMPLIFIED_POS_OUTPUT = {
    "need_simplication": "Yes",
    "instruction": "Apply a sunny filter."
}
EXAMPLE_SIMPLIFIED_NEG_INPUT = "Alter the palm tree leaves to a more vibrant green."
EXAMPLE_SIMPLIFIED_NEG_OUTPUT = {
    "need_simplication": "No",
    "instruction": "Alter the palm tree leaves to a more vibrant green."
}


# -- validation (the reference's pydantic checkers, ref:generate_edits.py:55-92)

def _is_sentence(s) -> bool:
    return isinstance(s, str) and len(s) > 0 and s[0].isalpha() and s[-1] == "."


def check_sequence(dct: dict, num: Optional[int] = None) -> bool:
    seq = dct.get("sequence")
    if not isinstance(seq, list) or (num is not None and len(seq) != num):
        return False
    for step in seq:
        if not isinstance(step, dict) or step.get("name") not in CATEGORY_NAMES:
            return False
        if not _is_sentence(step.get("instruction")):
            return False
    return _is_sentence(dct.get("reasoning"))


def check_compound(dct: dict) -> bool:
    return _is_sentence(dct.get("reasoning")) and _is_sentence(
        dct.get("compound_instruction")
    )


def check_simplified(dct: dict) -> bool:
    return dct.get("need_simplication") in ("Yes", "No") and _is_sentence(
        dct.get("instruction")
    )


# -- message builders ------------------------------------------------------

def build_option_prompt() -> str:
    """Numbered taxonomy text (ref:generate_edits.py:156-164)."""
    prompt = ""
    for idx, (meta_cat, cats) in enumerate(EDIT_CATEGORIES):
        prompt += f"{idx + 1}. {meta_cat}\n"
        for cat_name, cat_desc in cats:
            prompt += f"    * {cat_name}: {cat_desc}\n"
    return prompt


def _image_part(path: str) -> dict:
    with open(path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    return {"type": "image_url",
            "image_url": {"url": f"data:image/png;base64,{b64}"}}


def build_msgs_sequence(
    image_path: str, num: int, example_image: Optional[str] = None
) -> List[dict]:
    """System + (few-shot example turn) + user image
    (ref:generate_edits.py:167-195, if_example=True)."""
    msgs = [
        {"role": "system",
         "content": SEQUENCE_TEMPLATE.format(num=num, options=build_option_prompt())},
        {"role": "user", "content": [_image_part(image_path)]},
    ]
    if example_image is not None:
        msgs[1:1] = [
            {"role": "user", "content": [_image_part(example_image)]},
            {"role": "assistant", "content": json.dumps(EXAMPLE_CoT_SEQUENCE)},
        ]
    return msgs


def build_msgs_simplify(inst: str, with_examples: bool = True) -> List[dict]:
    """System + pos/neg few-shot pairs + user instruction
    (ref:generate_edits.py:198-232, if_example=True; text-only)."""
    msgs = [
        {"role": "system", "content": SIMPLIFY_TEMPLATE},
        {"role": "user", "content": inst},
    ]
    if with_examples:
        msgs[1:1] = [
            {"role": "user", "content": EXAMPLE_SIMPLIFIED_POS_INPUT},
            {"role": "assistant", "content": json.dumps(EXAMPLE_SIMPLIFIED_POS_OUTPUT)},
            {"role": "user", "content": EXAMPLE_SIMPLIFIED_NEG_INPUT},
            {"role": "assistant", "content": json.dumps(EXAMPLE_SIMPLIFIED_NEG_OUTPUT)},
        ]
    return msgs


def build_msgs_compound(
    image_path: str, sequence: List[dict], example_image: Optional[str] = None
) -> List[dict]:
    """System + (few-shot example turn) + user image/sequence
    (ref:generate_edits.py:235-269, if_example=True)."""
    msgs = [
        {"role": "system", "content": COMPOUND_TEMPLATE},
        {"role": "user", "content": [
            _image_part(image_path),
            {"type": "text", "text": json.dumps(sequence)},
        ]},
    ]
    if example_image is not None:
        msgs[1:1] = [
            {"role": "user", "content": [
                _image_part(example_image),
                {"type": "text", "text": json.dumps(EXAMPLE_CoT_SEQUENCE["sequence"])},
            ]},
            {"role": "assistant", "content": json.dumps(EXAMPLE_CoT_COMPOUND)},
        ]
    return msgs


# -- driver ----------------------------------------------------------------

def _ask_json(client, messages, check, *, max_tokens, temperature=None,
              retries: int = 5) -> dict:
    from gpt_image_edit_tpu.eval.judge import parse_json_scores

    last = None
    for _ in range(retries):
        text = client.complete(messages, max_tokens=max_tokens,
                               temperature=temperature)
        out = parse_json_scores(text)
        if out is not None and check(out):
            return out
        last = text
    raise ValueError(f"unparseable MLLM output after {retries} tries: {last!r:.200}")


def generate_for_image(
    image_path: str,
    client,
    *,
    max_complexity: int = 8,
    example_image: Optional[str] = None,
) -> Dict:
    """One image -> {reasoning, original_sequence, sequence, compound}
    (ref:generate_edits.py:272-336). `example_image` enables the image-bearing
    few-shot turns the release pipeline uses (the reference ships it as
    imgs/example_image.png); the text-only simplify examples are always on."""
    result = _ask_json(
        client, build_msgs_sequence(image_path, max_complexity, example_image),
        lambda d: check_sequence(d, max_complexity),
        max_tokens=1024, temperature=1.15,
    )
    result["original_sequence"] = result.pop("sequence")
    result["sequence"] = []
    for step in result["original_sequence"]:
        name, inst = step["name"], step["instruction"]
        simplified = _ask_json(
            client, build_msgs_simplify(inst), check_simplified, max_tokens=256,
        )
        final = (simplified["instruction"]
                 if simplified["need_simplication"] == "Yes" else inst)
        result["sequence"].append({"name": name, "instruction": final})

    # complexity-1 compound is the first atomic step verbatim (ref :311-316)
    result["compound"] = [
        {"reasoning": "none",
         "compound_instruction": result["sequence"][0]["instruction"]}
    ]
    for i in range(1, len(result["sequence"])):
        compound = _ask_json(
            client,
            build_msgs_compound(
                image_path, result["sequence"][: i + 1], example_image
            ),
            check_compound, max_tokens=256,
        )
        result["compound"].append(compound)
    return result


def generate_edits(
    image_dir: str,
    output_dir: str,
    client,
    *,
    max_complexity: int = 8,
    resume: bool = True,
    example_image: Optional[str] = None,
) -> List[str]:
    """All *.png under image_dir -> one instruction json each under
    output_dir (resumable). Returns the written json paths."""
    from glob import glob

    os.makedirs(output_dir, exist_ok=True)
    written = []
    for image_path in sorted(glob(os.path.join(image_dir, "*.png"))):
        stem = os.path.splitext(os.path.basename(image_path))[0]
        save_path = os.path.join(output_dir, f"{stem}.json")
        if resume and os.path.exists(save_path):
            written.append(save_path)
            continue
        result = generate_for_image(
            image_path, client, max_complexity=max_complexity,
            example_image=example_image,
        )
        with open(save_path, "w") as f:
            json.dump(result, f, indent=4)
        written.append(save_path)
    return written


class OpenAIChatClient:
    """gpt-4o generation backbone (ref model gpt-4o-2024-11-20,
    ref:generate_edits.py:278-284). Needs `openai` + OPENAI_API_KEY."""

    def __init__(self, model: str = "gpt-4o-2024-11-20",
                 base_url: Optional[str] = None,
                 api_key: Optional[str] = None):
        from openai import OpenAI

        self.client = OpenAI(
            api_key=api_key or os.environ.get("OPENAI_API_KEY"),
            base_url=base_url,
        )
        self.model = model

    def complete(self, messages, *, max_tokens: int,
                 temperature: Optional[float] = None) -> str:
        kw = {}
        if temperature is not None:
            kw["temperature"] = temperature
        resp = self.client.chat.completions.create(
            model=self.model, messages=messages,
            max_completion_tokens=max_tokens, **kw,
        )
        return resp.choices[0].message.content


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--path", "-p", required=True,
                    help="directory with input *.png images")
    ap.add_argument("--output-path", "-o", required=True)
    ap.add_argument("--max-complexity", "-c", type=int, default=8)
    ap.add_argument("--example-image", default=None,
                    help="few-shot example image (the release pipeline's "
                         "imgs/example_image.png)")
    ap.add_argument("--model", default="gpt-4o-2024-11-20")
    ap.add_argument("--base_url", default=None)
    args = ap.parse_args()
    paths = generate_edits(
        args.path, args.output_path, OpenAIChatClient(args.model, args.base_url),
        max_complexity=args.max_complexity, example_image=args.example_image,
    )
    print(f"{len(paths)} instruction files under {args.output_path}")
