/* Frontend for the TPU frame-interpolation API.
 * Same capability surface as the reference page (two-image upload with
 * drag-and-drop, client-side validation mirroring the server, POST
 * /interpolate, inline playback + download, keyboard shortcuts), written
 * against the stdlib server in serve/server.py. */

const API_BASE_URL = window.API_BASE_URL || "http://localhost:8000";
const MAX_BYTES = 50 * 1024 * 1024;
const OK_TYPES = new Set(["image/jpeg", "image/jpg", "image/png",
                          "image/bmp", "image/tiff"]);

const OK_VIDEO_EXT = ["mp4", "avi", "mov", "mkv", "webm"];

const files = { 1: null, 2: null, v: null };
let mode = "frames"; // "frames" | "video"
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

function validateVideo(file) {
  const ext = (file.name.split(".").pop() || "").toLowerCase();
  if (!file.type.startsWith("video/") && !OK_VIDEO_EXT.includes(ext))
    return "unsupported video type: " + (file.type || ext);
  if (file.size > MAX_BYTES) return "file exceeds the 50 MB limit";
  return null;
}

function refreshGo() {
  goBtn.disabled = mode === "video" ? !files.v : !(files[1] && files[2]);
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

// -- video mode ------------------------------------------------------------
(function wireVideoDrop() {
  const drop = document.getElementById("dropv");
  const input = document.getElementById("filev");
  const accept = (file) => {
    const err = validateVideo(file);
    if (err) { setStatus(err, "err"); return; }
    files.v = file;
    drop.classList.add("filled");
    drop.replaceChildren(
      Object.assign(document.createElement("div"),
                    { className: "label", textContent: file.name }),
      Object.assign(document.createElement("div"),
                    { className: "hint",
                      textContent: (file.size / (1024 * 1024)).toFixed(1) + " MB" }));
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
})();

function setMode(m) {
  mode = m;
  document.getElementById("tab-frames").classList.toggle("active", m === "frames");
  document.getElementById("tab-video").classList.toggle("active", m === "video");
  document.getElementById("mode-frames").hidden = m !== "frames";
  document.getElementById("dropv").hidden = m !== "video";
  document.getElementById("ctl-num").hidden = m !== "frames";
  document.getElementById("ctl-times").hidden = m !== "frames";
  document.getElementById("ctl-fps").hidden = m !== "frames"; // video: auto fps
  document.getElementById("ctl-factor").hidden = m !== "video";
  document.getElementById("ctl-target-fps").hidden = m !== "video";
  setStatus("");
  refreshGo();
}
document.getElementById("tab-frames").addEventListener("click", () => setMode("frames"));
document.getElementById("tab-video").addEventListener("click", () => setMode("video"));

function parseTimesField() {
  // comma-separated fractions in (0,1) for exact-time sampling; mirrors the
  // server validation so bad input fails before the upload
  const raw = document.getElementById("times").value.trim();
  if (!raw) return null;
  const times = raw.split(",").map((s) => s.trim()).filter((s) => s);
  for (const t of times) {
    const x = Number(t);
    if (!isFinite(x) || x <= 0 || x >= 1)
      throw new Error("each time must be a number in (0, 1): " + t);
  }
  if (times.length > 10) throw new Error("at most 10 exact times");
  return times;
}

function showVideoResult(blob) {
  const url = URL.createObjectURL(blob);
  const player = document.getElementById("player");
  player.hidden = false;
  player.src = url;
  document.getElementById("frames-strip").hidden = true;
  const dl = document.getElementById("download");
  dl.hidden = false;
  dl.href = url;
  dl.download = "interpolated_" + Date.now() + ".mp4";
  document.getElementById("result").hidden = false;
}

function showFramesResult(data) {
  // /interpolate-frames returns {frames: [base64 PNG, ...], times?: [...]}
  const strip = document.getElementById("frames-strip");
  strip.replaceChildren(...data.frames.map((b64, i) => {
    const fig = document.createElement("figure");
    fig.style.margin = "0";
    const img = document.createElement("img");
    img.src = "data:image/png;base64," + b64;
    img.style.maxWidth = "160px";
    img.style.borderRadius = "8px";
    const cap = document.createElement("figcaption");
    cap.className = "hint";
    cap.textContent = data.times ? "t = " + data.times[i]
                                 : "frame " + (i + 1);
    fig.append(img, cap);
    return fig;
  }));
  strip.hidden = false;
  document.getElementById("player").hidden = true;
  document.getElementById("download").hidden = true;
  document.getElementById("result").hidden = false;
}

async function generate() {
  const form = new FormData();
  let path;
  let times = null;
  try {
    if (mode === "video") {
      if (!files.v) return;
      path = "/interpolate-video";
      form.append("video", files.v);
      const targetFps = document.getElementById("target-fps").value.trim();
      if (targetFps) {
        const x = Number(targetFps);
        if (!isFinite(x) || x < 1 || x > 240)
          throw new Error("target FPS must be in [1, 240]");
        form.append("target_fps", targetFps); // fractional retiming
      } else {
        form.append("factor", document.getElementById("factor").value);
      }
    } else {
      if (!files[1] || !files[2]) return;
      times = parseTimesField();
      form.append("frame1", files[1]);
      form.append("frame2", files[2]);
      if (times) {
        path = "/interpolate-frames"; // exact-time sampling -> PNG frames
        form.append("times", times.join(","));
      } else {
        path = "/interpolate";
        form.append("num_intermediate", document.getElementById("num").value);
        form.append("fps", document.getElementById("fps").value);
      }
    }
  } catch (err) {
    setStatus(err.message, "err");
    return;
  }
  goBtn.disabled = true;
  setStatus("interpolating on TPU…", "busy");
  document.getElementById("result").hidden = true;

  try {
    const resp = await fetch(API_BASE_URL + path,
                             { method: "POST", body: form });
    if (!resp.ok) {
      let detail = resp.statusText;
      try { detail = (await resp.json()).detail || detail; } catch (_) {}
      throw new Error(detail);
    }
    if (times) showFramesResult(await resp.json());
    else showVideoResult(await resp.blob());
    setStatus("done", "ok");
  } catch (err) {
    setStatus("failed: " + err.message, "err");
  } finally {
    refreshGo();
  }
}

goBtn.addEventListener("click", generate);

document.getElementById("reset").addEventListener("click", () => {
  files.v = null;
  const dropv = document.getElementById("dropv");
  dropv.classList.remove("filled");
  dropv.replaceChildren(
    Object.assign(document.createElement("div"),
                  { className: "label", textContent: "Video clip" }),
    Object.assign(document.createElement("div"),
                  { className: "hint", innerHTML:
                    "click or drop a video<br>mp4 / avi / mov / mkv / webm, ≤ 50 MB" }));
  document.getElementById("filev").value = "";
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
  document.getElementById("times").value = "";
  document.getElementById("target-fps").value = "";
  document.getElementById("result").hidden = true;
  setStatus("");
  refreshGo();
});

document.addEventListener("keydown", (e) => {
  if ((e.ctrlKey || e.metaKey) && e.key === "Enter") generate();
  if (e.key === "Escape") document.getElementById("reset").click();
});
