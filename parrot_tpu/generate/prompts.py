"""Per-model-family chat prompt templates and stop-token sequences.

Port of the reference's ``prompt_config`` (``chat/base.py:202-290``): each
supported instruct/chat checkpoint family gets its published system-prompt
format plus the multi-token stop sequences its decoding needs. Matched on the
checkpoint path like the reference.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Tuple

StopTokens = Tuple[tuple, ...]


def prompt_config(checkpoint_dir: Path, tokenizer) -> tuple[str, StopTokens]:
    name = str(checkpoint_dir)
    eos = (tokenizer.eos_id,)

    if re.search(r"stabilityai.*tuned-alpha", name):
        system_prompt = (
            "<|SYSTEM|># StableLM Tuned (Alpha version)\n- StableLM is a helpful and harmless open-source AI language"
            " model developed by StabilityAI.\n- StableLM is excited to be able to help the user, but will refuse to do"
            " anything that could be considered harmful to the user.\n- StableLM is more than just an information"
            " source, StableLM is also able to write poetry, short stories, and make jokes.\n- StableLM will refuse to"
            " participate in anything that could harm a human.<|USER|>{prompt}<|ASSISTANT|>"
        )
        stops = (
            eos,
            (tokenizer.token_to_id("<|SYSTEM|>"),),
            (tokenizer.token_to_id("<|ASSISTANT|>"),),
            (tokenizer.token_to_id("<|USER|>"),),
        )
        return system_prompt, stops

    if re.search(r"togethercomputer.*Chat", name):
        system_prompt = "<human>: {prompt}\n<bot>:"
        lt, gt = tokenizer.token_to_id("<"), tokenizer.token_to_id(">:")
        stops = (
            eos,
            (lt, tokenizer.token_to_id("human"), gt),
            (lt, tokenizer.token_to_id("bot"), gt),
        )
        return system_prompt, stops

    if re.search(r"togethercomputer.*Instruct", name):
        system_prompt = "Q: {prompt}\nA:"
        colon = tokenizer.token_to_id(":")
        stops = (
            eos,
            (tokenizer.token_to_id("Q"), colon),
            (tokenizer.token_to_id("Question"),),
            (tokenizer.token_to_id("A"), colon),
            (tokenizer.token_to_id("Label"), colon),
            (187, 187),  # '\n', '\n'
            (535,),  # '\n\n'
            (2756,),  # '\n\n\n'
        )
        return system_prompt, stops

    if re.search(r"falcon.*-instruct", name):
        system_prompt = "Do not prefix your replies with 'Bot: '\nUser: {prompt}\n"
        stops = (
            eos,
            (tokenizer.token_to_id("User"), tokenizer.token_to_id(":")),
            (193, tokenizer.token_to_id("User")),  # 193: '\n'
        )
        return system_prompt, stops

    if re.search(r"vicuna|longchat", name):
        system_prompt = (
            "A chat between a curious user and an artificial intelligence assistant. The assistant gives helpful, "
            "detailed, and polite answers to the user's questions. USER: {prompt} ASSISTANT:"
        )
        return system_prompt, (eos,)

    if re.search(r"Llama-2.*-chat", name):
        b_inst, e_inst = "[INST]", "[/INST]"
        b_sys, e_sys = "<<SYS>>\n", "\n<</SYS>>\n\n"
        system_prompt = (
            f"{b_inst} {b_sys}You are a helpful, respectful and honest assistant. Always answer as helpfully as"
            " possible, while being safe.  Your answers should not include any harmful, unethical, racist, sexist,"
            " toxic, dangerous, or illegal content. Please ensure that your responses are socially unbiased and"
            " positive in nature.\n\nIf a question does not make any sense, or is not factually coherent, explain why"
            " instead of answering something not correct. If you don't know the answer to a question, please don't"
            f" share false information.{e_sys} {{prompt}} {e_inst} "
        )
        return system_prompt, (eos,)

    if re.search(r"FreeWilly2", name):
        system_prompt = (
            "### System:\nThis is a system prompt, please behave and help the user.\n\n"
            "### User:\n{prompt}\n\n### Assistant:\n"
        )
        return system_prompt, (eos,)

    return "{prompt}", (eos,)
