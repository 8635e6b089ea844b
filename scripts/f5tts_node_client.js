#!/usr/bin/env node
/**
 * Node streaming client for the EraXviF5TTS-TPU HTTP server.
 *
 * Parity surface of the reference node client
 * (`src/streaming/f5tts-node-client.js`): health check, reference listing,
 * reference upload, and streamed TTS with play-or-save — but with ZERO npm
 * dependencies: built-in `http` instead of node-fetch, hand-rolled multipart
 * instead of form-data, and playback by piping raw PCM into `aplay`/`play`
 * (whichever exists) instead of the native `speaker` module.
 *
 * Usage:
 *   node f5tts_node_client.js say "xin chao" --voice default --out out.wav
 *   node f5tts_node_client.js say "hello"            # pipes to aplay/play
 *   node f5tts_node_client.js upload ref.wav "transcript here" --id my_voice
 *   node f5tts_node_client.js refs
 *   node f5tts_node_client.js health
 * Options: --url http://localhost:8000 --nfe 32 --cfg 2.0 --speed 1.0
 *          --crossfade 0.15 --sway -1.0 --seed 42
 */
"use strict";

const fs = require("fs");
const http = require("http");
const https = require("https");
const { spawn } = require("child_process");
const { URL } = require("url");

class F5TTSClient {
  constructor({ apiUrl = "http://localhost:8000", defaultVoice = null } = {}) {
    this.apiUrl = apiUrl.replace(/\/$/, "");
    this.defaultVoice = defaultVoice;
  }

  _request(method, path, { headers = {}, body = null } = {}) {
    const u = new URL(this.apiUrl + path);
    const mod = u.protocol === "https:" ? https : http;
    return new Promise((resolve, reject) => {
      const req = mod.request(
        u, { method, headers }, res => resolve(res));
      req.on("error", reject);
      if (body) req.write(body);
      req.end();
    });
  }

  async _json(method, path, opts) {
    const res = await this._request(method, path, opts);
    const chunks = [];
    for await (const c of res) chunks.push(c);
    const text = Buffer.concat(chunks).toString("utf8");
    let data;
    try { data = JSON.parse(text); } catch { data = { raw: text }; }
    if (res.statusCode >= 400) {
      throw new Error(`${res.statusCode}: ${data.detail || text}`);
    }
    return data;
  }

  health() { return this._json("GET", "/health"); }
  listReferences() { return this._json("GET", "/references"); }

  /** Upload a reference wav + transcript; resolves when the server has
   *  FINISHED preprocessing (polls /references until the id is ready). */
  async uploadReference(filePath, refText, refId = null, { timeoutS = 120 } = {}) {
    const boundary = "----f5ttsnode" + Date.now().toString(16);
    const parts = [];
    const field = (name, value) => {
      parts.push(Buffer.from(
        `--${boundary}\r\ncontent-disposition: form-data; name="${name}"\r\n\r\n${value}\r\n`));
    };
    field("ref_text", refText || "");
    if (refId) field("reference_id", refId);
    parts.push(Buffer.from(
      `--${boundary}\r\ncontent-disposition: form-data; name="file"; ` +
      `filename="${filePath.split("/").pop()}"\r\n` +
      `content-type: application/octet-stream\r\n\r\n`));
    parts.push(fs.readFileSync(filePath));
    parts.push(Buffer.from(`\r\n--${boundary}--\r\n`));
    const body = Buffer.concat(parts);
    const out = await this._json("POST", "/upload_reference", {
      headers: {
        "content-type": `multipart/form-data; boundary=${boundary}`,
        "content-length": body.length,
      },
      body,
    });
    const id = out.reference_id;
    const deadline = Date.now() + timeoutS * 1000;
    while (Date.now() < deadline) {
      const refs = (await this.listReferences()).references || [];
      const mine = refs.find(r => r.id === id);
      if (mine && mine.ready) return id;
      await new Promise(r => setTimeout(r, 2000));
    }
    throw new Error(`reference ${id} not ready after ${timeoutS}s`);
  }

  /**
   * Stream synthesis. If `output` ends in .wav the full stream (header
   * included) is written there; otherwise raw PCM is piped into the first
   * available player (`aplay`, then sox `play`), starting with the first
   * chunk — true streaming playback.
   */
  async streamTTS({ text, voice = null, nfeStep, cfgStrength, speed,
                    crossFadeDuration, swayCoef, seed, output = null }) {
    const reqBody = JSON.stringify({
      text,
      speaker: voice || this.defaultVoice || undefined,
      nfe_step: nfeStep, cfg_strength: cfgStrength, speed,
      cross_fade_duration: crossFadeDuration, sway_sampling_coef: swayCoef,
      seed,
    });
    const res = await this._request("POST", "/tts/stream", {
      headers: { "content-type": "application/json",
                 "content-length": Buffer.byteLength(reqBody) },
      body: reqBody,
    });
    if (res.statusCode >= 400) {
      const chunks = [];
      for await (const c of res) chunks.push(c);
      throw new Error(`${res.statusCode}: ${Buffer.concat(chunks)}`);
    }

    if (output) {
      await new Promise((resolve, reject) => {
        const f = fs.createWriteStream(output);
        res.pipe(f);
        f.on("finish", resolve);
        f.on("error", reject);
        res.on("error", reject);
      });
      return output;
    }

    // live playback: parse the 44-byte WAV header for the sample rate, then
    // pipe s16le PCM straight into a CLI player as chunks arrive.
    return new Promise((resolve, reject) => {
      let header = Buffer.alloc(0);
      let player = null;
      res.on("data", chunk => {
        if (!player) {
          header = Buffer.concat([header, chunk]);
          if (header.length < 44) return;
          const rate = header.readUInt32LE(24);
          player = pickPlayer(rate);
          if (!player) {
            reject(new Error("no CLI audio player found (need aplay or sox " +
                             "`play`); use --out file.wav instead"));
            res.destroy();
            return;
          }
          player.on("close", code =>
            code === 0 || code === null ? resolve() : reject(
              new Error(`player exited ${code}`)));
          player.stdin.write(header.subarray(44));
        } else {
          player.stdin.write(chunk);
        }
      });
      res.on("end", () => { if (player) player.stdin.end(); else resolve(); });
      res.on("error", reject);
    });
  }
}

function pickPlayer(rate) {
  const candidates = [
    ["aplay", ["-q", "-f", "S16_LE", "-r", String(rate), "-c", "1"]],
    ["play", ["-q", "-t", "raw", "-e", "signed", "-b", "16",
              "-r", String(rate), "-c", "1", "-"]],
  ];
  for (const [cmd, args] of candidates) {
    try {
      const p = spawn(cmd, args, { stdio: ["pipe", "ignore", "ignore"] });
      p.on("error", () => {});
      if (p.pid) return p;
    } catch { /* try next */ }
  }
  return null;
}

// ---- CLI ----------------------------------------------------------------

function parseArgs(argv) {
  const pos = [], opt = {};
  for (let i = 0; i < argv.length; i++) {
    if (argv[i].startsWith("--")) opt[argv[i].slice(2)] = argv[++i];
    else pos.push(argv[i]);
  }
  return { pos, opt };
}

async function main() {
  const { pos, opt } = parseArgs(process.argv.slice(2));
  const client = new F5TTSClient({ apiUrl: opt.url || "http://localhost:8000",
                                   defaultVoice: opt.voice || null });
  const cmd = pos[0];
  if (cmd === "health") {
    console.log(JSON.stringify(await client.health(), null, 2));
  } else if (cmd === "refs") {
    console.log(JSON.stringify(await client.listReferences(), null, 2));
  } else if (cmd === "upload") {
    const id = await client.uploadReference(pos[1], pos[2] || "", opt.id || null);
    console.log(`reference ready: ${id}`);
  } else if (cmd === "say") {
    const out = await client.streamTTS({
      text: pos.slice(1).join(" "),
      voice: opt.voice,
      nfeStep: opt.nfe ? parseInt(opt.nfe) : undefined,
      cfgStrength: opt.cfg ? parseFloat(opt.cfg) : undefined,
      speed: opt.speed ? parseFloat(opt.speed) : undefined,
      crossFadeDuration: opt.crossfade ? parseFloat(opt.crossfade) : undefined,
      swayCoef: opt.sway ? parseFloat(opt.sway) : undefined,
      seed: opt.seed ? parseInt(opt.seed) : undefined,
      output: opt.out || null,
    });
    if (out) console.log(`saved: ${out}`);
  } else {
    console.error("usage: f5tts_node_client.js <say|upload|refs|health> …");
    process.exit(2);
  }
}

if (require.main === module) {
  main().catch(err => { console.error(err.message); process.exit(1); });
}

module.exports = { F5TTSClient };
