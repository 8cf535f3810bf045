/* Frontend for the TPU frame-interpolation API.
 * Same capability surface as the reference page (two-image upload with
 * drag-and-drop, client-side validation mirroring the server, POST
 * /interpolate, inline playback + download, keyboard shortcuts), written
 * against the stdlib server in serve/server.py. */

const API_BASE_URL = window.API_BASE_URL || "http://localhost:8000";
const MAX_BYTES = 50 * 1024 * 1024;
const OK_TYPES = new Set(["image/jpeg", "image/jpg", "image/png",
                          "image/bmp", "image/tiff"]);

const files = { 1: null, 2: null };
const statusEl = document.getElementById("status");
const goBtn = document.getElementById("go");

function setStatus(msg, cls) {
  statusEl.textContent = "";
  statusEl.className = cls || "";
  if (cls === "busy") {
    const s = document.createElement("span");
    s.className = "spinner";
    statusEl.appendChild(s);
  }
  statusEl.appendChild(document.createTextNode(msg));
}

function validate(file) {
  if (!OK_TYPES.has(file.type)) return "unsupported image type: " + file.type;
  if (file.size > MAX_BYTES) return "file exceeds the 50 MB limit";
  return null;
}

function refreshGo() {
  goBtn.disabled = !(files[1] && files[2]);
}

function wireDrop(n) {
  const drop = document.getElementById("drop" + n);
  const input = document.getElementById("file" + n);

  const accept = (file) => {
    const err = validate(file);
    if (err) { setStatus(err, "err"); return; }
    files[n] = file;
    drop.classList.add("filled");
    const img = document.createElement("img");
    img.src = URL.createObjectURL(file);
    drop.replaceChildren(img,
      Object.assign(document.createElement("div"),
                    { className: "hint", textContent: file.name }));
    setStatus("");
    refreshGo();
  };

  drop.addEventListener("click", () => input.click());
  drop.addEventListener("keydown", (e) => {
    if (e.key === "Enter" || e.key === " ") input.click();
  });
  input.addEventListener("change", () => {
    if (input.files[0]) accept(input.files[0]);
  });
  ["dragover", "dragenter"].forEach((ev) =>
    drop.addEventListener(ev, (e) => {
      e.preventDefault();
      drop.classList.add("hover");
    }));
  ["dragleave", "drop"].forEach((ev) =>
    drop.addEventListener(ev, (e) => {
      e.preventDefault();
      drop.classList.remove("hover");
    }));
  drop.addEventListener("drop", (e) => {
    const file = e.dataTransfer.files[0];
    if (file) accept(file);
  });
}
wireDrop(1);
wireDrop(2);

async function generate() {
  if (!files[1] || !files[2]) return;
  goBtn.disabled = true;
  setStatus("interpolating on TPU…", "busy");
  document.getElementById("result").hidden = true;

  const form = new FormData();
  form.append("frame1", files[1]);
  form.append("frame2", files[2]);
  form.append("num_intermediate", document.getElementById("num").value);
  form.append("fps", document.getElementById("fps").value);

  try {
    const resp = await fetch(API_BASE_URL + "/interpolate",
                             { method: "POST", body: form });
    if (!resp.ok) {
      let detail = resp.statusText;
      try { detail = (await resp.json()).detail || detail; } catch (_) {}
      throw new Error(detail);
    }
    const blob = await resp.blob();
    const url = URL.createObjectURL(blob);
    const player = document.getElementById("player");
    player.src = url;
    const dl = document.getElementById("download");
    dl.href = url;
    dl.download = "interpolated_" + Date.now() + ".mp4";
    document.getElementById("result").hidden = false;
    setStatus("done", "ok");
  } catch (err) {
    setStatus("failed: " + err.message, "err");
  } finally {
    refreshGo();
  }
}

goBtn.addEventListener("click", generate);

document.getElementById("reset").addEventListener("click", () => {
  for (const n of [1, 2]) {
    files[n] = null;
    const drop = document.getElementById("drop" + n);
    drop.classList.remove("filled");
    drop.replaceChildren(
      Object.assign(document.createElement("div"),
                    { className: "label",
                      textContent: "Frame " + n + (n === 1 ? " (earlier)" : " (later)") }),
      Object.assign(document.createElement("div"),
                    { className: "hint", innerHTML:
                      "click or drop an image<br>jpg / png / bmp / tiff, ≤ 50 MB" }));
    document.getElementById("file" + n).value = "";
  }
  document.getElementById("result").hidden = true;
  setStatus("");
  refreshGo();
});

document.addEventListener("keydown", (e) => {
  if ((e.ctrlKey || e.metaKey) && e.key === "Enter") generate();
  if (e.key === "Escape") document.getElementById("reset").click();
});
