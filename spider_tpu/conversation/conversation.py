"""Chat conversation state (cf. /root/reference/spider/conversation/
conversation.py:17-238): history dataclass + separator styles + prompt
rendering for the web demos."""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, List, Tuple


class SeparatorStyle(enum.Enum):
    SINGLE = enum.auto()
    TWO = enum.auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str] = ("Human", "Assistant")
    messages: List[List[Any]] = dataclasses.field(default_factory=list)
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: str = ""

    def get_prompt(self) -> str:
        if self.sep_style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in self.messages:
                if message:
                    ret += f"{role}: {message}{self.sep}"
                else:
                    ret += f"{role}:"
            return ret
        seps = [self.sep, self.sep2]
        ret = self.system + seps[0]
        for i, (role, message) in enumerate(self.messages):
            if message:
                ret += f"{role}: {message}{seps[i % 2]}"
            else:
                ret += f"{role}:"
        return ret

    def append_message(self, role: str, message: Any) -> None:
        self.messages.append([role, message])

    def to_gradio_chatbot(self) -> List[List[Any]]:
        ret = []
        for i, (role, msg) in enumerate(self.messages[self.offset:]):
            if i % 2 == 0:
                ret.append([msg, None])
            else:
                ret[-1][-1] = msg
        return ret

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system, roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            offset=self.offset, sep_style=self.sep_style,
            sep=self.sep, sep2=self.sep2)


CONV_VISION = Conversation(
    system=("Give the following image: <Img>ImageContent</Img>. "
            "You will be able to see the image once I provide it to you. "
            "Please answer my questions."),
    roles=("Human", "Assistant"),
    sep="###",
)
