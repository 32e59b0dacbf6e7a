// Custom <audio> wrapper: play/pause, ±10 s skip, click-to-seek bar.

import { useEffect, useRef, useState } from "react";

export default function AudioPlayer({ src }: { src: string }) {
  const audioRef = useRef<HTMLAudioElement | null>(null);
  const [playing, setPlaying] = useState(false);
  const [time, setTime] = useState(0);
  const [duration, setDuration] = useState(0);

  useEffect(() => {
    const el = audioRef.current;
    if (!el) return;
    const onTime = () => setTime(el.currentTime);
    const onMeta = () => setDuration(el.duration || 0);
    const onEnd = () => setPlaying(false);
    el.addEventListener("timeupdate", onTime);
    el.addEventListener("loadedmetadata", onMeta);
    el.addEventListener("ended", onEnd);
    return () => {
      el.removeEventListener("timeupdate", onTime);
      el.removeEventListener("loadedmetadata", onMeta);
      el.removeEventListener("ended", onEnd);
    };
  }, [src]);

  const toggle = () => {
    const el = audioRef.current;
    if (!el) return;
    if (playing) el.pause();
    else void el.play();
    setPlaying(!playing);
  };

  const skip = (delta: number) => {
    const el = audioRef.current;
    if (el) el.currentTime = Math.max(0, Math.min(duration, el.currentTime + delta));
  };

  const seek = (ev: React.MouseEvent<HTMLDivElement>) => {
    const el = audioRef.current;
    if (!el || !duration) return;
    const rect = ev.currentTarget.getBoundingClientRect();
    el.currentTime = ((ev.clientX - rect.left) / rect.width) * duration;
  };

  const fmt = (s: number) =>
    `${Math.floor(s / 60)}:${Math.floor(s % 60).toString().padStart(2, "0")}`;

  return (
    <div className="audio-player">
      <audio ref={audioRef} src={src} preload="metadata" />
      <div className="row">
        <button onClick={() => skip(-10)}>−10 s</button>
        <button className="primary" onClick={toggle}>
          {playing ? "Pause" : "Play"}
        </button>
        <button onClick={() => skip(10)}>+10 s</button>
        <span className="time">
          {fmt(time)} / {fmt(duration)}
        </span>
      </div>
      <div className="seek-bar" onClick={seek}>
        <div
          className="seek-fill"
          style={{ width: duration ? `${(time / duration) * 100}%` : "0%" }}
        />
      </div>
    </div>
  );
}
