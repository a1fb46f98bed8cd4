"""Frontend conversation library + built-in HTML UI.

Behavioral model: the reference's gradio frontend state machine
(Emu2/demo/frontend/libs/meta.py): `DataMeta` items (text / image / video /
grounding-box), min-side-448 resize, grounding boxes rendered as white
rectangles on a 448² canvas and emitted as
`<phrase>name</phrase><object>[mask]</object>[image]` prompt fragments,
`ConvMeta.format_chat` role alternation and `format_prompt` for
generation (prepending `<grounding>` when boxes are present).

gradio is not available in this image, so the UI itself is a single
self-contained HTML page (`FRONTEND_HTML`, served by the backend or by
`python -m emu_tpu.serving.frontend`) that speaks the same multipart
/v1/mmc + /v1/mmg protocol.
"""

from __future__ import annotations

import enum
import logging
import uuid
from typing import List, Optional, Tuple

import numpy as np

EVA_IMAGE_SIZE = 448
GRD = "<grounding>"
BOP, EOP = "<phrase>", "</phrase>"
BOO, EOO = "<object>", "</object>"
VIDEO_TOKEN, FAKE_VIDEO_END = "[VIDEO]", "[/VIDEO]"
USER_TOKEN, ASSISTANT_TOKEN, EOS = "[USER]", "[ASSISTANT]", "</s>"

logger = logging.getLogger("emu_tpu.frontend")


class Role(enum.Enum):
    USER = 0
    ASSISTANT = 1


class DataType(enum.Enum):
    TEXT = 0
    IMAGE = 1
    VIDEO = 2
    GROUNDING = 3
    ERROR = 4


class DataMeta:
    """One conversation item."""

    def __init__(self):
        self.text = self.image = self.coordinate = self.frames = None
        self.mask = self.stack_frame = None
        self.datatype = DataType.TEXT

    @classmethod
    def build(cls, text=None, image=None, coordinate=None, frames=None,
              is_error: bool = False, resize: bool = True) -> "DataMeta":
        ins = cls()
        ins.text = text if text != "" else None
        ins.image = cls.resize(image) if resize else image
        ins.coordinate = cls.fix(coordinate)
        ins.frames = cls.resize(frames) if resize else frames
        if is_error:
            ins.datatype = DataType.ERROR
        elif coordinate is not None:
            ins.datatype = DataType.GROUNDING
            ins.draw_box()
        elif image is not None:
            ins.datatype = DataType.IMAGE
        elif text is not None:
            ins.datatype = DataType.TEXT
        else:
            ins.datatype = DataType.VIDEO
            if ins.frames:
                ins.stack()
        return ins

    @staticmethod
    def fix(coordinate):
        if coordinate is None:
            return None
        l, t, r, b = (min(EVA_IMAGE_SIZE, max(0, v)) for v in coordinate)
        return min(l, r), min(t, b), max(l, r), max(t, b)

    @staticmethod
    def resize(image):
        """Min-side-448 downscale (ref meta.py:181-206)."""
        from PIL import Image
        if image is None:
            return None
        single = isinstance(image, Image.Image)
        imgs = [image] if single else list(image)
        for i, im in enumerate(imgs):
            w, h = im.size
            if w < EVA_IMAGE_SIZE or h < EVA_IMAGE_SIZE:
                continue
            if w < h:
                h = int(EVA_IMAGE_SIZE / w * h)
                w = EVA_IMAGE_SIZE
            else:
                w = int(EVA_IMAGE_SIZE / h * w)
                h = EVA_IMAGE_SIZE
            imgs[i] = im.resize((w, h))
        return imgs[0] if single else imgs

    def stack(self):
        """Filmstrip preview: sampled frames pasted side by side into one
        image (ref meta.py:214-220) — what the UI shows for a video."""
        from PIL import Image
        w, h = self.frames[0].size
        n = len(self.frames)
        strip = Image.new(mode="RGB", size=(w * n, h))
        for idx, f in enumerate(self.frames):
            strip.paste(f, (idx * w, 0))
        self.stack_frame = strip
        return strip

    def draw_box(self):
        """White rectangle on a 448² black canvas (ref meta.py:208-213)."""
        import cv2
        from PIL import Image
        left, top, right, bottom = self.coordinate
        mask = np.zeros((EVA_IMAGE_SIZE, EVA_IMAGE_SIZE, 3), np.uint8)
        mask = cv2.rectangle(mask, (left, top), (right, bottom),
                             (255, 255, 255), 3)
        self.mask = Image.fromarray(mask)

    def format_prompt(self) -> List:
        if self.datatype == DataType.TEXT:
            return [self.text]
        if self.datatype == DataType.IMAGE:
            return [self.image]
        if self.datatype == DataType.VIDEO:
            return [VIDEO_TOKEN] + list(self.frames) + [FAKE_VIDEO_END]
        if self.datatype == DataType.GROUNDING:
            ret = []
            if self.text is not None:
                ret.append(f"{BOP}{self.text}{EOP}")
            ret += [BOO, self.mask, EOO]
            if self.image is not None:
                ret.append(self.image)
            return ret
        return []


class ConvMeta:
    """Conversation state (ref meta.py:225-290)."""

    def __init__(self, system: Optional[str] = None):
        self.system = system or (
            "You are a helpful assistant, dedicated to delivering "
            "comprehensive and meticulous responses.")
        self.message: List[Tuple[Role, DataMeta]] = []
        self.log_id = uuid.uuid4().hex

    def append(self, role: Role, item: DataMeta):
        self.message.append((role, item))

    def format_prompt(self) -> List:
        """Generation-tab prompt; prepends <grounding> if boxes present."""
        ret, has_coor = [], False
        for _, p in self.message:
            has_coor |= p.datatype == DataType.GROUNDING
            ret += p.format_prompt()
        if has_coor:
            ret.insert(0, GRD)
        return ret

    def format_chat(self) -> List:
        ret: List = [self.system]
        prev = None
        for r, p in self.message:
            if prev != r:
                if prev == Role.ASSISTANT:
                    ret.append(f"{EOS}{USER_TOKEN}: ")
                elif prev is None:
                    ret.append(f" {USER_TOKEN}: ")
                else:
                    ret.append(f" {ASSISTANT_TOKEN}: ")
                prev = r
            ret += p.format_prompt()
        ret.append(f" {ASSISTANT_TOKEN}:")
        return ret

    def pop(self):
        if self.message:
            self.message.pop()

    def clear(self):
        self.message = []
        self.log_id = uuid.uuid4().hex


FRONTEND_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>emu-tpu demo</title>
<style>
 body{font-family:sans-serif;max-width:860px;margin:2em auto;padding:0 1em}
 textarea,input{width:100%;box-sizing:border-box;margin:.3em 0}
 .row{display:flex;gap:1em}.row>*{flex:1}
 #chatlog{border:1px solid #ccc;padding:1em;min-height:8em;
          white-space:pre-wrap}
 img.result{max-width:100%;border:1px solid #ccc}
 button{padding:.5em 1.5em;margin:.3em .3em 0 0}
 h2{border-bottom:1px solid #eee;padding-bottom:.3em}
</style></head><body>
<h1>emu-tpu</h1>
<h2>Multimodal Chat (/v1/mmc)</h2>
<div id="chatlog"></div>
<input type="file" id="chatimg" accept="image/*">
<input type="file" id="chatvid" accept="video/*" onchange="strip(this)">
<canvas id="filmstrip" style="max-width:100%;display:none;
 border:1px solid #ccc"></canvas>
<textarea id="chattext" rows="2" placeholder="ask about the image..."></textarea>
<div class="row">
 <label>beams <input id="beams" type="number" value="5"></label>
 <label>max new <input id="maxnew" type="number" value="64"></label>
</div>
<button onclick="chat()">Send</button>
<h2>Visual Generation (/v1/mmg)</h2>
<input type="file" id="genimg" accept="image/*">
<textarea id="gentext" rows="2" placeholder="a photo of..."></textarea>
<div class="row">
 <label>cfg <input id="cfg" type="number" value="3.0" step="0.5"></label>
 <label>steps <input id="steps" type="number" value="50"></label>
 <label>height <input id="genh" type="number" placeholder="default"></label>
 <label>width <input id="genw" type="number" placeholder="default"></label>
 <label>cache interval <input id="gencache" type="number" value="1"
  title="UNet block caching: reuse deep features for N-1 of every N steps (faster, approximate)"></label>
</div>
<button onclick="gen()">Generate</button>
<div><img id="genout" class="result"></div>
<script>
let vidFrames = [];   // sampled video frames (Blobs), set by strip()
function withTimeout(p, ms, what){
 return Promise.race([p, new Promise((_, rej) =>
   setTimeout(() => rej(new Error(what + " timed out")), ms))]);
}
async function sampleFrames(file, n){
 // decode n midpoint-spaced frames via <video> + canvas (the client-side
 // analogue of pipelines/preprocess.extract_frames); every wait is
 // bounded so an unsupported codec errors instead of hanging the UI
 const url = URL.createObjectURL(file);
 const v = document.createElement("video");
 try{
  v.src = url; v.muted = true;
  await withTimeout(new Promise((res, rej) => {
    v.onloadedmetadata = res;
    v.onerror = () => rej(new Error("unsupported video"));
  }), 10000, "video metadata");
  const c = document.createElement("canvas");
  c.width = v.videoWidth; c.height = v.videoHeight;
  const ctx = c.getContext("2d");
  const frames = [];
  for (let i = 0; i < n; i++){
   v.currentTime = (i + 0.5) / n * v.duration;
   await withTimeout(new Promise(res => v.onseeked = res), 10000,
                     "frame seek");
   ctx.drawImage(v, 0, 0);
   frames.push(await new Promise(res => c.toBlob(res, "image/jpeg", 0.9)));
  }
  return {frames, w: v.videoWidth, h: v.videoHeight};
 }finally{
  URL.revokeObjectURL(url);
 }
}
function clearStrip(){
 vidFrames = [];
 const c = document.getElementById("filmstrip");
 c.style.display = "none";
}
async function strip(input){
 // filmstrip preview: frames pasted side by side (ref meta.py stack());
 // clearing the file input (or a decode failure) detaches the video so
 // later messages don't silently re-send stale frames
 clearStrip();
 if (!input.files.length) return;
 try{
  const n = 4;
  const {frames, w, h} = await sampleFrames(input.files[0], n);
  vidFrames = frames;
  const c = document.getElementById("filmstrip");
  c.width = w * n; c.height = h;
  const ctx = c.getContext("2d");
  for (let i = 0; i < n; i++){
   const img = await createImageBitmap(frames[i]);
   ctx.drawImage(img, i * w, 0);
  }
  c.style.display = "block";
 }catch(e){
  input.value = "";
  alert("could not decode video: " + e);
 }
}
async function post(path, fields, img){
 const fd = new FormData();
 const prompt = [];
 if (img && img.files.length){prompt.push(["IMAGE","img0"]);
   fd.append("img0", img.files[0]);}
 if (fields.video && vidFrames.length){
   const keys = vidFrames.map((_, i) => "vidf" + i);
   vidFrames.forEach((b, i) => fd.append(keys[i], b, keys[i] + ".jpg"));
   prompt.push(["VIDEO", keys]);
 }
 if (fields.text) prompt.push(["TEXT", fields.text]);
 fd.append("prompt", JSON.stringify(prompt));
 fd.append("log_id", Math.random().toString(36).slice(2));
 for (const [k,v] of Object.entries(fields.extra||{})) fd.append(k,v);
 const r = await fetch(path, {method:"POST", body:fd});
 return r.json();
}
async function chat(){
 const text = document.getElementById("chattext").value;
 const log = document.getElementById("chatlog");
 log.textContent += "USER: " + text + "\\n";
 const res = await post("/v1/mmc", {text, video: true, extra:{
   num_beams: document.getElementById("beams").value,
   max_new_tokens: document.getElementById("maxnew").value}},
   document.getElementById("chatimg"));
 log.textContent += "ASSISTANT: " +
   (res.code===0?res.data:("[error] "+res.data)) + "\\n";
 // one-shot video attach: the frames were sent with THIS message
 document.getElementById("chatvid").value = "";
 clearStrip();
}
async function gen(){
 const extra = {
   classifier_free_guidance: document.getElementById("cfg").value,
   steps: document.getElementById("steps").value};
 const h = document.getElementById("genh").value;
 const w = document.getElementById("genw").value;
 if (h) extra.height = h;
 if (w) extra.width = w;
 const ci = document.getElementById("gencache").value;
 if (ci && ci > 1) extra.cache_interval = ci;
 const res = await post("/v1/mmg",
  {text: document.getElementById("gentext").value, extra},
  document.getElementById("genimg"));
 if (res.code===0)
   document.getElementById("genout").src = "data:image/webp;base64,"+res.data;
 else alert(res.data);
}
</script></body></html>
"""
